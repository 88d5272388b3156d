"""Pipeline facade tests: the reference's YAML config shape runs
end-to-end (reference README.md:17-42 surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mkpipe_extractor_clickhouse_spark.pipeline import Pipeline, run_pipelines


def test_config_dict_pipeline(spark, sf_dir, tmp_path):
    config = {
        "connections": {
            "lake_source": {"variant": "parquet", "path": sf_dir},
            "warehouse": {"variant": "parquet", "path": str(tmp_path / "wh")},
        },
        "pipelines": [
            {
                "name": "lake_to_wh",
                "source": "lake_source",
                "destination": "warehouse",
                "tables": [
                    {"name": "nation", "target_name": "stg_nation"},
                    {
                        "name": "events",
                        "target_name": "stg_events",
                        "replication_method": "incremental",
                        "iterate_column": "event_id",
                        "iterate_column_type": "int",
                        "dedup_keys": ["event_id"],
                    },
                    {
                        "name": "events",
                        "target_name": "agg_events",
                        "replication_method": "full",
                        "custom_query": (
                            "SELECT event_type, COUNT(*) AS n FROM events "
                            "{query_filter} GROUP BY event_type"
                        ),
                    },
                ],
            }
        ],
    }
    results = run_pipelines(config, spark)["lake_to_wh"]
    assert [r.status for r in results] == ["extracted"] * 3
    assert results[0].write_mode == "overwrite"
    assert results[1].write_mode == "overwrite"  # initial incremental load
    assert results[1].last_point is not None

    wh = str(tmp_path / "wh")
    assert spark.read.parquet(f"{wh}/stg_nation.parquet").count() == 25
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert spark.read.parquet(f"{wh}/stg_events.parquet").count() == n_events
    agg = spark.read.parquet(f"{wh}/agg_events.parquet")
    assert set(agg.columns) == {"event_type", "n"}

    # second tick: incremental sees no new data beyond the boundary row
    results2 = run_pipelines(config, spark)["lake_to_wh"]
    assert results2[1].status == "extracted"  # boundary >= re-read
    assert (
        spark.read.parquet(f"{wh}/stg_events.parquet").count() == n_events
    )  # idempotent via dedup_keys


def test_pass_on_error(spark, sf_dir, tmp_path):
    pipe = Pipeline(
        source_dir=sf_dir,
        dest_dir=str(tmp_path),
        tables=[
            {"name": "nonexistent_table", "pass_on_error": True},
            {"name": "region"},
        ],
    )
    results = pipe.run(spark)
    assert results[0].status == "error"
    assert results[1].status == "extracted"
    assert spark.read.parquet(f"{tmp_path}/region.parquet").count() == 5


def test_tag_selective_execution(spark, sf_dir, tmp_path):
    """reference README.md:116: tags select which tables a run touches."""
    pipe = Pipeline(
        source_dir=sf_dir,
        dest_dir=str(tmp_path),
        tables=[
            {"name": "region", "tags": ["dims"]},
            {"name": "nation", "tags": ["dims", "geo"]},
            {"name": "supplier", "tags": ["facts"]},
        ],
    )
    results = pipe.run(spark, tags=["dims"])
    assert [r.table for r in results] == ["region", "nation"]
    results_all = pipe.run(spark)  # no tags → everything
    assert len(results_all) == 3


def test_cli_main(sf_dir, tmp_path):
    """python -m mkpipe_extractor_clickhouse_spark <config.json> runs a
    pipeline end-to-end and reports per-table JSON lines."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    config = {
        "connections": {
            "src": {"variant": "parquet", "path": sf_dir},
            "dst": {"variant": "parquet", "path": str(tmp_path / "out")},
        },
        "pipelines": [
            {
                "name": "p1",
                "source": "src",
                "destination": "dst",
                "tables": [{"name": "region"}],
            }
        ],
    }
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps(config))
    repo = str(Path(__file__).resolve().parent.parent)
    out = subprocess.run(
        [sys.executable, "-m", "mkpipe_extractor_clickhouse_spark", str(cfg)],
        capture_output=True,
        text=True,
        cwd=repo,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines[-1]["table"] == "region"
    assert lines[-1]["status"] == "extracted"


def test_pipeline_manifest_destination(spark, sf_dir, tmp_path):
    """variant: manifest destination runs ticks through the
    ManifestIncrementalRunner — snapshots + watermark in ONE atomic
    commit, no sidecar _state.json at all."""
    import os

    from mkpipe_extractor_clickhouse_spark.pipeline import run_pipelines
    from mkpipe_extractor_clickhouse_spark.sources.extract import TableConfig
    from mkpipe_extractor_clickhouse_spark.sources.manifest import (
        ManifestLoader,
    )

    dst = str(tmp_path / "lake")
    config = {
        "connections": {
            "src": {"variant": "parquet", "path": sf_dir},
            "lake": {"variant": "manifest", "path": dst},
        },
        "pipelines": [
            {
                "name": "to_lake",
                "source": "src",
                "destination": "lake",
                "tables": [
                    {
                        "name": "events",
                        "replication_method": "incremental",
                        "iterate_column": "event_id",
                        "iterate_column_type": "int",
                        "dedup_keys": ["event_id"],
                    }
                ],
            }
        ],
    }
    out = run_pipelines(config, spark)
    assert out["to_lake"][0].status == "extracted"
    loader = ManifestLoader(dst)
    t = TableConfig(name="events")
    from mkpipe_extractor_clickhouse_spark.catalog import load_table

    n_src = load_table(spark, sf_dir, "events").count()
    assert loader.table(t).read(spark).count() == n_src
    # watermark inside the manifest, not a sidecar
    assert loader.last_point(t) == str(n_src - 1)
    assert not os.path.exists(os.path.join(dst, "_state.json"))
    # idle second tick: boundary row re-extracted, nothing re-published
    head = loader.table(t).head_version()
    run_pipelines(config, spark)
    assert loader.table(t).head_version() == head
    assert loader.table(t).read(spark).count() == n_src
