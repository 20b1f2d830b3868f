#!/bin/bash
# r11 sf1 re-certification chunks (re-run after session restart wiped /tmp).
cd /root/repo
SF=.fixtures/sf1
C=.sf1_chunks

# 1. former oracle-cost exclusions (verdict item 2) minus calibration_curve (solo, big driver)
python tools/selfcheck.py --json $C/excl.json $SF \
  dedup_containment_pairs dedup_lsh_quality_audit dedup_minhash_calibration \
  graph_link_prediction split_leakage_safe > $C/excl.log 2>&1

# 2. calibration_curve solo with 24g driver
SPARK_GRAFT_DRIVER_MEM=24g python tools/selfcheck.py --json $C/curve.json $SF \
  dedup_minhash_calibration_curve > $C/curve.log 2>&1

# 3. light changed queries (accuracy bump / decimal fix / hits guard / new)
python tools/selfcheck.py --json $C/light.json $SF \
  agg_approx_percentiles agg_histogram_equidepth dq_distribution_drift dq_outliers_mad \
  orders_rfm_segmentation feature_winsorize exp_quantile_lift exp_variance_homogeneity \
  funnel_time_to_convert orders_repurchase_cycle text_length_histogram agg_decimal_exact \
  streaming_experiment_readout graph_hits_trade text_length_deciles > $C/light.log 2>&1

# 4. minhash-oracle-changed re-certs (moderate)
python tools/selfcheck.py --json $C/mh.json $SF \
  dedup_minhash_signature dedup_minhash_lsh graph_degree_distribution \
  dedup_cluster_size_hist > $C/mh.log 2>&1

# 5. heavy clusters family + exact-path embedding re-certs
python tools/selfcheck.py --json $C/heavy1.json $SF dedup_clusters dedup_clusters_star > $C/heavy1.log 2>&1
python tools/selfcheck.py --json $C/heavy2.json $SF dedup_canonical_docs > $C/heavy2.log 2>&1
python tools/selfcheck.py --json $C/heavy3.json $SF dedup_embedding_neardup > $C/heavy3.log 2>&1
echo ALL_CHUNKS_DONE
