"""Semantic tests for the experimentation family: every statistic is
recomputed independently in Python (hashlib md5 + float arithmetic) from
the raw parquet and compared to the query output — the oracle hash-match
proves Spark ≡ DuckDB, these prove both match the textbook formulas."""

from __future__ import annotations

import hashlib
import math

from arc_cassandra_pipeline_plugin_spark.queries import load_all
from arc_cassandra_pipeline_plugin_spark.queries.experiment import (
    _N_BOOT,
    _N_PERM,
    _POISSON_CUM_1M,
)
from tests.conftest import SF_SMALL

REGISTRY = load_all()


def _bucket(salt: str, key, modulus: int) -> int:
    h = int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8], 16)
    return h % modulus


def _per_user(spark):
    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    users: dict[int, float] = {}
    for r in rows:
        users[r["user_id"]] = users.get(r["user_id"], 0.0) + round(r["value"], 2)
    return {u: (s, _bucket("expassign", u, 2)) for u, s in users.items()}


def test_welch_t2_matches_textbook_formula(spark):
    out = REGISTRY["exp_welch_t2"].fn(spark, SF_SMALL).collect()[0]
    users = _per_user(spark)
    a = [s for s, g in users.values() if g == 0]
    b = [s for s, g in users.values() if g == 1]
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se2 = va / len(a) + vb / len(b)
    t2 = (ma - mb) ** 2 / se2
    df = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert math.isclose(out["welch_t2"], t2, rel_tol=1e-4, abs_tol=1e-5)
    assert math.isclose(out["welch_df"], df, rel_tol=1e-4, abs_tol=1e-3)
    assert math.isclose(out["mean_a"], ma, rel_tol=1e-6, abs_tol=1e-5)


def test_conversion_z2_counts_and_srm_exact(spark):
    out = REGISTRY["exp_conversion_z2"].fn(spark, SF_SMALL).collect()[0]
    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    conv: dict[int, int] = {}
    for r in rows:
        hit = 1 if (r["event_type"] == "purchase" and r["value"] >= 200.0) else 0
        conv[r["user_id"]] = max(conv.get(r["user_id"], 0), hit)
    n = [0, 0]
    x = [0, 0]
    for u, c in conv.items():
        g = _bucket("expassign", u, 2)
        n[g] += 1
        x[g] += c
    assert (out["n_a"], out["x_a"], out["n_b"], out["x_b"]) == (
        n[0],
        x[0],
        n[1],
        x[1],
    )
    srm = (n[0] - n[1]) ** 2 / (n[0] + n[1])
    assert math.isclose(out["srm_chi2"], srm, rel_tol=1e-9, abs_tol=5e-7)
    pa, pb = x[0] / n[0], x[1] / n[1]
    pp = (x[0] + x[1]) / (n[0] + n[1])
    if 0 < pp < 1:
        z2 = (pa - pb) ** 2 / (pp * (1 - pp) * (1 / n[0] + 1 / n[1]))
        assert math.isclose(out["z2"], z2, rel_tol=1e-4, abs_tol=1e-5)
    else:
        assert out["z2"] is None


def test_cuped_theta_is_the_regression_slope_and_rho2_bounded(spark):
    out = REGISTRY["exp_cuped_adjustment"].fn(spark, SF_SMALL).collect()[0]
    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    cutoff = "2024-01-15"
    pu: dict[int, list[float]] = {}
    for r in rows:
        xy = pu.setdefault(r["user_id"], [0.0, 0.0])
        v = round(r["value"], 2)
        if str(r["ts"]) < cutoff:
            xy[0] += v
        else:
            xy[1] += v
    xs = [v[0] for v in pu.values()]
    ys = [v[1] for v in pu.values()]
    n = len(xs)
    xbar, ybar = sum(xs) / n, sum(ys) / n
    cxy = sum(x * y for x, y in zip(xs, ys)) - n * xbar * ybar
    cxx = sum(x * x for x in xs) - n * xbar * xbar
    cyy = sum(y * y for y in ys) - n * ybar * ybar
    assert out["n_users"] == n
    assert math.isclose(out["theta"], cxy / cxx, rel_tol=1e-4, abs_tol=1e-5)
    rho2 = cxy * cxy / (cxx * cyy)
    assert math.isclose(out["var_reduction"], rho2, rel_tol=1e-4, abs_tol=1e-6)
    assert 0.0 <= out["var_reduction"] <= 1.0
    # the adjusted lift is the raw lift minus theta times the pre-period
    # arm imbalance — verify the identity on group sums
    arm = {u: _bucket("expassign", u, 2) for u in pu}
    theta = cxy / cxx
    means = {}
    for g in (0, 1):
        us = [u for u in pu if arm[u] == g]
        means[g] = (
            sum(pu[u][1] for u in us) / len(us)
            - theta * (sum(pu[u][0] for u in us) / len(us) - xbar)
        )
    assert math.isclose(
        out["cuped_diff"], means[0] - means[1], rel_tol=1e-4, abs_tol=1e-5
    )


def test_permutation_pvalue_is_the_addone_count(spark):
    out = REGISTRY["exp_permutation_test"].fn(spark, SF_SMALL).collect()[0]
    assert out["n_perm"] == _N_PERM
    assert 0 <= out["n_ge"] <= _N_PERM
    assert math.isclose(
        out["p_value"], round((1 + out["n_ge"]) / (1 + _N_PERM), 6), abs_tol=5e-7
    )
    # independent recompute of the permutation distribution
    users = _per_user(spark)
    ms = []
    for b in range(_N_PERM):
        g0 = [s for u, (s, _) in users.items() if _bucket(f"perm{b}", u, 2) == 0]
        g1 = [s for u, (s, _) in users.items() if _bucket(f"perm{b}", u, 2) == 1]
        ms.append(abs(sum(g0) / len(g0) - sum(g1) / len(g1)))
    a = [s for s, g in users.values() if g == 0]
    b_ = [s for s, g in users.values() if g == 1]
    tobs = abs(sum(a) / len(a) - sum(b_) / len(b_))
    n_ge = sum(1 for m in ms if m >= tobs - 1e-9)
    assert abs(n_ge - out["n_ge"]) <= 1  # float-boundary slack on >= compares
    assert math.isclose(out["t_obs"], tobs, rel_tol=1e-6, abs_tol=1e-5)


def test_poisson_bootstrap_order_statistics(spark):
    out = REGISTRY["exp_poisson_bootstrap"].fn(spark, SF_SMALL).collect()[0]
    assert out["n_replicates"] == _N_BOOT
    assert out["ci_lo"] <= out["ci_hi"]
    users = _per_user(spark)

    def weight(b, u):
        # 48-bit md5 prefix (hash_bucket_wide): the [0,1e6) grid's modulus
        # does not divide a power-of-two space, so the draw uses 12 hex chars
        bucket = (
            int(hashlib.md5(f"boot{b}:{u}".encode()).hexdigest()[:12], 16)
            % 1_000_000
        )
        for k, t in enumerate(_POISSON_CUM_1M):
            if bucket < t:
                return k
        return len(_POISSON_CUM_1M)

    ms = []
    for b in range(_N_BOOT):
        ws = {u: weight(b, u) for u in users}
        tot = sum(ws.values())
        ms.append(sum(ws[u] * s for u, (s, _) in users.items()) / tot)
    ms.sort()
    assert math.isclose(out["ci_lo"], ms[1], rel_tol=1e-6, abs_tol=1e-5)
    assert math.isclose(out["ci_hi"], ms[_N_BOOT - 2], rel_tol=1e-6, abs_tol=1e-5)
    pm = sum(s for s, _ in users.values()) / len(users)
    assert math.isclose(out["point_mean"], pm, rel_tol=1e-6, abs_tol=1e-5)
    # the Poisson(1) thresholds are the inverse-CDF grid they claim to be
    acc, fact, total = 0.0, 1.0, 0.0
    for k, t in enumerate(_POISSON_CUM_1M):
        if k > 0:
            fact *= k
        total += math.exp(-1.0) / fact
        assert t == math.floor(total * 1_000_000)


def test_did_is_the_double_difference_of_means(spark):
    out = REGISTRY["exp_did_midmonth"].fn(spark, SF_SMALL).collect()[0]
    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    pu: dict[int, list[float]] = {}
    for r in rows:
        xy = pu.setdefault(r["user_id"], [0.0, 0.0])
        xy[0 if str(r["ts"]) < "2024-01-15" else 1] += round(r["value"], 2)
    arms = {u: _bucket("expassign", u, 2) for u in pu}
    means = {}
    for g in (0, 1):
        us = [u for u in pu if arms[u] == g]
        means[g] = (
            sum(pu[u][0] for u in us) / len(us),
            sum(pu[u][1] for u in us) / len(us),
        )
    did = (means[0][1] - means[0][0]) - (means[1][1] - means[1][0])
    assert math.isclose(out["did"], did, rel_tol=1e-5, abs_tol=1e-4)
    assert math.isclose(out["pre_mean_a"], means[0][0], rel_tol=1e-6, abs_tol=1e-5)
    assert math.isclose(out["post_mean_b"], means[1][1], rel_tol=1e-6, abs_tol=1e-5)


def test_quantile_lift_returns_stored_order_statistics(spark):
    rows = {
        r["arm"]: r
        for r in REGISTRY["exp_quantile_lift"].fn(spark, SF_SMALL).collect()
    }
    users = _per_user(spark)
    for arm, r in rows.items():
        vals = sorted(s for s, g in users.values() if g == arm)
        assert r["n_users"] == len(vals)
        assert r["q25"] <= r["q50"] <= r["q75"] <= r["q90"]
        for p, col in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75"), (0.9, "q90")):
            # exact discrete quantile: a stored element with the right rank
            # (lossless-accuracy sketch), allow the floor/ceil boundary pair
            k = max(0, min(len(vals) - 1, math.ceil(p * len(vals)) - 1))
            candidates = {vals[k], vals[min(len(vals) - 1, k + 1)]}
            assert any(math.isclose(r[col], c, rel_tol=1e-9) for c in candidates)


def test_sequential_z2_counts_monotone_and_exact(spark):
    out = sorted(
        REGISTRY["exp_sequential_z2"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["week"],
    )
    assert [r["week"] for r in out] == [1, 2, 3, 4]
    for a, b in zip(out, out[1:]):
        assert a["n_a"] <= b["n_a"] and a["n_b"] <= b["n_b"]
        assert a["x_a"] <= b["x_a"] and a["x_b"] <= b["x_b"]
    # independent recompute of the week-2 checkpoint
    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    first_seen: dict[int, str] = {}
    first_conv: dict[int, str] = {}
    for r in rows:
        ts = str(r["ts"])
        u = r["user_id"]
        first_seen[u] = min(first_seen.get(u, ts), ts)
        if r["event_type"] == "purchase" and r["value"] >= 200.0:
            first_conv[u] = min(first_conv.get(u, ts), ts)
    cut = "2024-01-15"
    n = [0, 0]
    x = [0, 0]
    for u in first_seen:
        g = _bucket("expassign", u, 2)
        n[g] += 1 if first_seen[u] < cut else 0
        x[g] += 1 if first_conv.get(u, "9999") < cut else 0
    wk2 = out[1]
    assert (wk2["n_a"], wk2["x_a"], wk2["n_b"], wk2["x_b"]) == (
        n[0],
        x[0],
        n[1],
        x[1],
    )


def test_randomized_response_coins_and_debias(spark):
    out = REGISTRY["privacy_randomized_response"].fn(spark, SF_SMALL).collect()[0]
    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    truth: dict[int, int] = {}
    for r in rows:
        hit = 1 if (r["event_type"] == "purchase" and r["value"] >= 200.0) else 0
        truth[r["user_id"]] = max(truth.get(r["user_id"], 0), hit)
    rep = 0
    for u, t in truth.items():
        c1 = _bucket("rrcoin1", u, 2)
        c2 = _bucket("rrcoin2", u, 2)
        rep += t if c1 == 0 else c2
    n = len(truth)
    assert out["n_users"] == n
    assert out["true_converters"] == sum(truth.values())
    assert out["reported_ones"] == rep
    assert math.isclose(
        out["debiased_rate"], (rep / n - 0.25) / 0.5, rel_tol=1e-6, abs_tol=1e-5
    )


def test_power_mde_matches_textbook_formula(spark):
    out = REGISTRY["exp_power_mde"].fn(spark, SF_SMALL).collect()[0]
    users = _per_user(spark)
    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    conv: dict[int, int] = {}
    for r in rows:
        hit = 1 if (r["event_type"] == "purchase" and r["value"] >= 200.0) else 0
        conv[r["user_id"]] = max(conv.get(r["user_id"], 0), hit)
    na = sum(1 for _, g in users.values() if g == 0)
    nb = sum(1 for _, g in users.values() if g == 1)
    n = na + nb
    pp = sum(conv.values()) / n
    vals = [s for s, _ in users.values()]
    mean = sum(vals) / n
    var_s = sum((v - mean) ** 2 for v in vals) / (n - 1)
    z = 1.959963984540054 + 0.8416212335729143
    mde_conv = z * math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
    mde_mean = z * math.sqrt(var_s * (1 / na + 1 / nb))
    assert out["n_users"] == n
    assert math.isclose(out["base_rate"], pp, rel_tol=1e-6, abs_tol=1e-5)
    assert math.isclose(out["mde_conversion"], mde_conv, rel_tol=1e-5, abs_tol=1e-5)
    assert math.isclose(out["mde_mean"], mde_mean, rel_tol=1e-5, abs_tol=1e-4)


def test_lift_by_region_segments_partition_the_users(spark):
    rows = REGISTRY["exp_lift_by_region"].fn(spark, SF_SMALL).collect()
    users = _per_user(spark)
    # every user joins exactly one region, so segment counts partition n
    assert sum(r["n_a"] + r["n_b"] for r in rows) == len(users)
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    }
    nat = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in spark.read.parquet(f"{SF_SMALL}/nation.parquet").collect()
    }
    reg = {
        r["r_regionkey"]: r["r_name"]
        for r in spark.read.parquet(f"{SF_SMALL}/region.parquet").collect()
    }
    by_region: dict[str, list] = {}
    for u, (s, g) in users.items():
        by_region.setdefault(reg[nat[cust[u]]], []).append((s, g))
    for r in rows:
        seg = by_region[r["r_name"]]
        a = [s for s, g in seg if g == 0]
        b = [s for s, g in seg if g == 1]
        assert (r["n_a"], r["n_b"]) == (len(a), len(b))
        if a and b:
            assert math.isclose(
                r["lift"],
                sum(a) / len(a) - sum(b) / len(b),
                rel_tol=1e-5,
                abs_tol=1e-4,
            )
        else:
            assert r["lift"] is None


def _unit_welch(ms_a, ms_b):
    na, nb = len(ms_a), len(ms_b)
    ma, mb = sum(ms_a) / na, sum(ms_b) / nb
    va = sum((x - ma) ** 2 for x in ms_a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in ms_b) / (nb - 1)
    return ma, mb, (ma - mb) ** 2 / (va / na + vb / nb)


def test_switchback_units_are_days(spark):
    out = REGISTRY["exp_switchback_daily"].fn(spark, SF_SMALL).collect()[0]
    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    days: dict[str, list[float]] = {}
    for r in rows:
        days.setdefault(str(r["ts"])[:10], []).append(round(r["value"], 2))
    ms = {0: [], 1: []}
    for d, vs in days.items():
        ms[_bucket("swb", d, 2)].append(round(sum(vs) / len(vs), 6))
    assert (out["n_units_a"], out["n_units_b"]) == (len(ms[0]), len(ms[1]))
    ma, mb, t2 = _unit_welch(ms[0], ms[1])
    assert math.isclose(out["mean_a"], ma, rel_tol=1e-6, abs_tol=1e-5)
    assert math.isclose(out["lift"], ma - mb, rel_tol=1e-5, abs_tol=1e-5)
    assert math.isclose(out["welch_t2"], t2, rel_tol=1e-4, abs_tol=1e-5)


def test_cluster_randomized_units_are_nations(spark):
    out = (
        REGISTRY["exp_cluster_randomized_nation"].fn(spark, SF_SMALL).collect()[0]
    )
    users = _per_user(spark)
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    }
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF_SMALL}/nation.parquet").collect()
    }
    clus: dict[str, list[float]] = {}
    for u, (s, _) in users.items():
        clus.setdefault(nat[cust[u]], []).append(s)
    ms = {0: [], 1: []}
    for nm, vs in clus.items():
        ms[_bucket("cluster", nm, 2)].append(round(sum(vs) / len(vs), 6))
    assert (out["n_units_a"], out["n_units_b"]) == (len(ms[0]), len(ms[1]))
    ma, mb, t2 = _unit_welch(ms[0], ms[1])
    assert math.isclose(out["mean_a"], ma, rel_tol=1e-6, abs_tol=1e-4)
    assert math.isclose(out["welch_t2"], t2, rel_tol=1e-4, abs_tol=1e-4)


def test_uplift_deciles_partition_users_and_match_counts(spark):
    rows = sorted(
        REGISTRY["exp_uplift_by_pre_decile"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["decile"],
    )
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    pu: dict[int, list] = {}
    for r in ev:
        rec = pu.setdefault(r["user_id"], [0.0, 0])
        if str(r["ts"]) < "2024-01-15":
            rec[0] += round(r["value"], 2)
        elif r["event_type"] == "purchase" and r["value"] >= 200.0:
            rec[1] = 1
    n = len(pu)
    assert sum(r["n_a"] + r["n_b"] for r in rows) == n
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # SQL ntile sizing: first N % 10 deciles get one extra row
    base, rem = divmod(n, 10)
    sizes = [r["n_a"] + r["n_b"] for r in rows]
    assert sizes == [base + 1 if i < rem else base for i in range(10)]
    # decile 1 holds the globally smallest pre-period covariates
    order = sorted(pu.items(), key=lambda kv: (kv[1][0], kv[0]))
    d1 = {u for u, _ in order[: sizes[0]]}
    arms = {u: _bucket("expassign", u, 2) for u in pu}
    assert rows[0]["x_a"] == sum(pu[u][1] for u in d1 if arms[u] == 0)


def test_novelty_weeks_partition_user_weeks(spark):
    rows = sorted(
        REGISTRY["exp_novelty_weekly_lift"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["week"],
    )
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    import datetime as dt

    uw: dict[tuple, list] = {}
    for r in ev:
        week = (r["ts"].date() - dt.date(2024, 1, 1)).days // 7 + 1
        uw.setdefault((r["user_id"], week), []).append(round(r["value"], 2))
    per_week: dict[int, list] = {}
    for (u, w), vs in uw.items():
        per_week.setdefault(w, []).append((sum(vs), _bucket("expassign", u, 2)))
    assert [r["week"] for r in rows] == sorted(per_week)
    for r in rows:
        seg = per_week[r["week"]]
        a = [s for s, g in seg if g == 0]
        b = [s for s, g in seg if g == 1]
        assert (r["n_a"], r["n_b"]) == (len(a), len(b))
        if a and b:
            assert math.isclose(
                r["lift"], sum(a) / len(a) - sum(b) / len(b),
                rel_tol=1e-5, abs_tol=1e-4,
            )


def test_attrition_counts_exact(spark):
    out = REGISTRY["exp_attrition_check"].fn(spark, SF_SMALL).collect()[0]
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    pre: dict[int, int] = {}
    post: dict[int, int] = {}
    for r in ev:
        if str(r["ts"]) < "2024-01-15":
            pre[r["user_id"]] = 1
        else:
            post[r["user_id"]] = 1
    n = [0, 0]
    d = [0, 0]
    for u in pre:
        g = _bucket("expassign", u, 2)
        n[g] += 1
        d[g] += 0 if u in post else 1
    assert (out["n_pre_a"], out["dropped_a"], out["n_pre_b"], out["dropped_b"]) == (
        n[0],
        d[0],
        n[1],
        d[1],
    )
    # degenerate pool (zero drops) must yield NULL z2, else the formula
    tot = d[0] + d[1]
    if tot == 0 or tot == n[0] + n[1]:
        assert out["z2"] is None
    else:
        pa, pb = d[0] / n[0], d[1] / n[1]
        pp = tot / (n[0] + n[1])
        z2 = (pa - pb) ** 2 / (pp * (1 - pp) * (1 / n[0] + 1 / n[1]))
        assert math.isclose(out["z2"], z2, rel_tol=1e-4, abs_tol=1e-5)


def test_group_sequential_obf_boundaries_and_decision(spark):
    out = sorted(
        REGISTRY["exp_group_sequential_obf"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["week"],
    )
    assert [r["week"] for r in out] == [1, 2, 3, 4]
    # boundary LUT is exactly C^2 * K / k for the published C = 2.024
    c2 = 2.024 * 2.024
    for r in out:
        assert math.isclose(r["obf_bound_z2"], c2 * 4 / r["week"], rel_tol=1e-12)
    # boundaries are strictly decreasing (the OBF envelope shape)
    for a, b in zip(out, out[1:]):
        assert a["obf_bound_z2"] > b["obf_bound_z2"]
    # crossed is the pointwise comparison; rejected_by is its running max
    seq = sorted(
        REGISTRY["exp_sequential_z2"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["week"],
    )
    running = 0
    for r, s in zip(out, seq):
        assert r["z2"] == s["z2"] and r["n_a"] == s["n_a"] and r["n_b"] == s["n_b"]
        expect_crossed = int(r["z2"] is not None and r["z2"] >= r["obf_bound_z2"])
        assert r["crossed"] == expect_crossed
        running = max(running, expect_crossed)
        assert r["rejected_by"] == running


def test_post_stratified_matches_textbook_reweighting(spark):
    out = REGISTRY["exp_post_stratified"].fn(spark, SF_SMALL).collect()[0]
    users = _per_user(spark)
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    }
    strata: dict[str, list] = {}
    for u, (s, g) in users.items():
        strata.setdefault(seg.get(u, "NONE"), []).append((s, g))
    assert out["n_users"] == len(users)
    # raw diff over all users
    a = [s for s, g in users.values() if g == 0]
    b = [s for s, g in users.values() if g == 1]
    assert math.isclose(
        out["raw_diff"], sum(a) / len(a) - sum(b) / len(b), rel_tol=1e-6, abs_tol=1e-5
    )
    # post-stratified: population-share-weighted per-stratum differences,
    # renormalized over strata holding both arms
    num, den, n_incl = 0.0, 0, 0
    for vals in strata.values():
        sa = [s for s, g in vals if g == 0]
        sb = [s for s, g in vals if g == 1]
        if not sa or not sb:
            continue
        n_incl += 1
        num += len(vals) * (sum(sa) / len(sa) - sum(sb) / len(sb))
        den += len(vals)
    assert out["n_strata"] == n_incl
    assert math.isclose(out["poststrat_diff"], num / den, rel_tol=1e-5, abs_tol=1e-5)


def test_mann_whitney_matches_textbook_ranksum(spark):
    out = REGISTRY["exp_mann_whitney_u"].fn(spark, SF_SMALL).collect()[0]
    users = _per_user(spark)
    vals = sorted((round(s, 2), g) for s, g in users.values())
    n = len(vals)
    n_b = sum(1 for _, g in vals if g == 1)
    n_a = n - n_b
    assert (out["n_a"], out["n_b"]) == (n_a, n_b)
    # average ranks with ties, in x2 units to stay integral
    rank2 = {}
    i = 0
    tie_cubes = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        t = j - i
        tie_cubes += t**3 - t
        rank2[vals[i][0]] = (i + 1) + j  # 2 * average of ranks i+1..j
        i = j
    r2b = sum(rank2[v] for v, g in vals if g == 1)
    u2 = r2b - n_b * (n_b + 1)
    assert out["u2"] == u2 and out["tie_cubes"] == tie_cubes
    var = n_a * n_b / 12.0 * ((n + 1.0) - tie_cubes / (n * (n - 1.0)))
    z2 = (u2 - n_a * n_b) ** 2 / (4.0 * var)
    assert math.isclose(out["z2"], z2, rel_tol=1e-6, abs_tol=1e-5)


def test_variance_homogeneity_matches_textbook_bf(spark):
    out = REGISTRY["exp_variance_homogeneity"].fn(spark, SF_SMALL).collect()[0]
    users = _per_user(spark)
    arms = {0: [], 1: []}
    for s, g in users.values():
        arms[g].append(round(s, 2))
    med = {}
    for g, xs in arms.items():
        xs.sort()
        med[g] = xs[math.ceil(0.5 * len(xs)) - 1]  # quantile_disc lower-median
    assert math.isclose(out["med_a"], med[0], rel_tol=1e-9)
    assert math.isclose(out["med_b"], med[1], rel_tol=1e-9)
    z = {g: [round(abs(x - med[g]), 2) for x in xs] for g, xs in arms.items()}
    na, nb = len(z[0]), len(z[1])
    za, zb = sum(z[0]) / na, sum(z[1]) / nb
    zbar = (sum(z[0]) + sum(z[1])) / (na + nb)
    between = na * (za - zbar) ** 2 + nb * (zb - zbar) ** 2
    within = sum((x - za) ** 2 for x in z[0]) + sum((x - zb) ** 2 for x in z[1])
    f = (na + nb - 2.0) * between / within
    assert math.isclose(out["bf_f"], f, rel_tol=1e-4, abs_tol=1e-4)
