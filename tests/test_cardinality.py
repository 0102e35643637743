"""HLL++ distinct counting with exact audit (relational.approx_user_cardinality)."""

from pyspark.sql import functions as F

from credit_ocr_system_spark.operators import relational as R


def test_bound_holds_and_exact_is_exact(spark, sf_dir):
    events = R.load(spark, sf_dir, "events")
    out = R.approx_user_cardinality(events).toPandas()
    assert out.within_bound.all()
    want = (events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .toPandas().set_index("event_type").n)
    got = out.set_index("event_type").exact_users
    assert got.sort_index().tolist() == want.sort_index().tolist()


def test_tight_rsd_still_within_bound(spark, sf_dir):
    # rsd drives both the sketch precision and the audit bound; the
    # bound must hold at a tighter setting too (more registers)
    events = R.load(spark, sf_dir, "events")
    out = R.approx_user_cardinality(events, rsd=0.02).toPandas()
    assert out.within_bound.all()
