"""materialize(): the lineage-truncation helper behind every shared
intermediate (r16, VERDICT r15 item 8 — the reliable-checkpoint
posture promoted from a code comment to a session-level switch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fact_hive_custom_spark.materialize import materialize


def test_default_is_local_checkpoint(spark, monkeypatch):
    monkeypatch.delenv("FHC_RELIABLE_CHECKPOINT", raising=False)
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = materialize(df)
    # eager + lineage-truncated: the materialized plan is a scan of
    # existing RDD blocks, not the original range+project
    assert "Scan ExistingRDD" in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 100


def test_reliable_checkpoint_env_switch(spark, monkeypatch, tmp_path):
    monkeypatch.setenv("FHC_RELIABLE_CHECKPOINT", "1")
    monkeypatch.setenv("FHC_CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    df = spark.range(50).withColumn("v", F.col("id") + 7)
    out = materialize(df)
    # same contract: eager, truncated, identical rows
    assert "Scan ExistingRDD" in out._jdf.queryExecution().executedPlan().toString()
    assert sorted(r.v for r in out.collect()) == [i + 7 for i in range(50)]
    # and the context's checkpoint dir now points at the reliable dir
    got = spark.sparkContext._jsc.sc().getCheckpointDir()
    assert not got.isEmpty()
    assert str(tmp_path / "ckpt") in got.get()
