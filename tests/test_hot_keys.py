"""Count-min-sketch heavy-hitter detection (relational.hot_keys).

Covers the three claims the operator makes:

* CMS one-sided error — estimates never undercount (the `never_under`
  column is structurally TRUE for every candidate);
* a seeded pathologically hot key is flagged `is_hot` while the
  background keys are not;
* the plan keeps its scale shape: the sketch probe is a broadcast
  join, the sketch build aggregates map-side partials, and no
  sort-merge join appears anywhere.
"""

import contextlib
import io

from pyspark.sql import functions as F

from credit_ocr_system_spark.operators import relational as R


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _skewed_events(spark, n_hot=400, n_bg=5, n_bg_keys=160):
    # one key owns 1/3 of the stream (est*160 >> N); 160 background
    # keys hold 5 records each (5*160 = 800 < N=1200 -> not hot unless
    # a collision pile-up inflates the min across ALL depth rows)
    hot = spark.range(n_hot).select(
        F.concat(F.lit("e"), F.col("id")).alias("event_id"),
        F.lit("hotkey").alias("user_id"))
    bg = spark.range(n_bg * n_bg_keys).select(
        F.concat(F.lit("b"), F.col("id")).alias("event_id"),
        F.concat(F.lit("bg"), (F.col("id") % n_bg_keys)).alias("user_id"))
    return hot.unionByName(bg)


def test_cms_never_underestimates(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = R.hot_keys(events).toPandas()
    assert len(out) > 0
    assert out["never_under"].all()
    # width 512 >> distinct keys at sf0.001: most estimates exact
    assert (out["est_count"] >= out["exact_count"]).all()


def test_seeded_hot_key_is_flagged(spark):
    out = R.hot_keys(_skewed_events(spark)).toPandas().set_index("key")
    # hot key: 400 of 1200 records; 400*160 >= 1200 by a mile
    assert bool(out.loc["hotkey", "is_hot"])
    # background keys hold 5 records (5*160 = 800 < 1200): not hot
    # unless all 4 depth rows collide AND the pile-up reaches 7.5 —
    # deterministic md5 placement, so allow at most a couple of the
    # 160 keys to be CMS false positives (the documented error mode)
    bg = out[out.index.str.startswith("bg")]
    assert len(bg) > 100  # most bg keys sampled into the candidate set
    assert int(bg["is_hot"].sum()) <= 3
    assert out["never_under"].all()


def test_hot_keys_plan_shape(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = plan_of(R.hot_keys(events))
    # the depth x width sketch broadcasts to the candidate probe
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # sketch build: map-side partial counts before the slot exchange
    assert "partial_count" in plan
