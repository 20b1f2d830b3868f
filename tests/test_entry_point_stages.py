"""ServiceLoader-parity plugin discovery: an EXTERNAL package contributes a
stage class via an ``importlib.metadata`` entry point in the
``arc_cassandra_pipeline_plugin_spark.stages`` group, and declarative config
instantiates it by ``"type"`` with zero edits to this repo — the 1:1
analogue of the reference's
``META-INF/services/ai.tripl.arc.plugins.PipelineStagePlugin:1-3`` loaded at
parse time (``TestUtils.scala:79``).

The test builds a real on-disk distribution (module + ``*.dist-info`` with
``entry_points.txt``) in a tmp dir and prepends it to ``sys.path`` — exactly
what ``pip install`` of a plugin package would produce.
"""

from __future__ import annotations

import textwrap

import pytest

from arc_cassandra_pipeline_plugin_spark.config import ConfigError, parse_config
from arc_cassandra_pipeline_plugin_spark.context import PipelineContext
from arc_cassandra_pipeline_plugin_spark.stages import (
    ENTRY_POINT_GROUP,
    STAGE_REGISTRY,
    load_entry_point_stages,
)

PLUGIN_MODULE = textwrap.dedent(
    '''
    """A third-party stage package, as a plugin author would write it."""
    from dataclasses import dataclass

    from arc_cassandra_pipeline_plugin_spark.stages import PipelineStage


    @dataclass
    class GreetingTransform(PipelineStage):
        stage_type: str = "GreetingTransform"
        output_view: str = "greeting"

        def _run(self, spark, ctx):
            df = spark.createDataFrame([("hello from the plugin",)], "greeting string")
            df.createOrReplaceTempView(self.output_view)
            return df


    class NotAStage:
        pass
    '''
)


def _install_plugin_dist(tmp_path, monkeypatch, entry_line):
    site = tmp_path / "site"
    site.mkdir(exist_ok=True)
    (site / "arc_greeting_plugin.py").write_text(PLUGIN_MODULE)
    dist_info = site / "arc_greeting_plugin-1.0.dist-info"
    dist_info.mkdir(exist_ok=True)
    (dist_info / "METADATA").write_text(
        "Metadata-Version: 2.1\nName: arc-greeting-plugin\nVersion: 1.0\n"
    )
    (dist_info / "entry_points.txt").write_text(
        f"[{ENTRY_POINT_GROUP}]\n{entry_line}\n"
    )
    monkeypatch.syspath_prepend(str(site))
    return site


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    STAGE_REGISTRY.pop("GreetingTransform", None)
    import sys

    sys.modules.pop("arc_greeting_plugin", None)


def test_entry_point_stage_discovered_and_registered(tmp_path, monkeypatch):
    _install_plugin_dist(
        tmp_path, monkeypatch, "greeting = arc_greeting_plugin:GreetingTransform"
    )
    assert "GreetingTransform" not in STAGE_REGISTRY
    registered = load_entry_point_stages(refresh=True)
    assert "GreetingTransform" in registered
    assert "GreetingTransform" in STAGE_REGISTRY


def test_parse_config_instantiates_plugin_stage_lazily(spark, tmp_path, monkeypatch):
    """The full contract: unknown type at parse time triggers discovery, the
    plugin stage instantiates from config and runs in a pipeline."""
    _install_plugin_dist(
        tmp_path, monkeypatch, "greeting = arc_greeting_plugin:GreetingTransform"
    )
    STAGE_REGISTRY.pop("GreetingTransform", None)
    pipeline = parse_config(
        {"stages": [{"type": "GreetingTransform", "name": "plugin stage"}]}
    )
    df = pipeline.run(spark, PipelineContext())
    assert [r["greeting"] for r in df.collect()] == ["hello from the plugin"]


def test_non_stage_entry_point_fails_loudly(tmp_path, monkeypatch):
    _install_plugin_dist(
        tmp_path, monkeypatch, "bad = arc_greeting_plugin:NotAStage"
    )
    with pytest.raises(TypeError, match="PipelineStage subclass"):
        load_entry_point_stages(refresh=True)


def test_unknown_type_still_errors_after_discovery(tmp_path, monkeypatch):
    with pytest.raises(ConfigError, match="unknown stage type"):
        parse_config({"stages": [{"type": "NoSuchStage", "name": "x"}]})
