"""Property-based KMV guarantees (hypothesis): for ANY pair of small
key sets the sketch report must be EXACT (sets fit inside k), and the
estimator must be invariant to duplication and row order."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from financial_data_stream_processing_engine_spark.operators import sketch

keys = st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=keys, b=keys, dup=st.integers(min_value=1, max_value=3))
def test_kmv_exact_on_small_sets_and_duplication_invariant(spark, a, b, dup):
    rows = [("a", str(x)) for x in a] * dup + [("b", str(x)) for x in b] * dup
    df = spark.createDataFrame(rows, "tag string, k string")
    r = sketch.kmv_setops_report(df, "tag", F.col("k"), k=256).collect()[0]
    assert (r.true_a, r.true_b) == (len(a), len(b))
    assert r.true_union == len(a | b)
    assert r.true_intersect == len(a & b)
    # both sets fit inside the sketch → every estimate is exact
    # (up to 32-bit hash collisions, which cannot occur for < 2^16
    # keys drawn from a 10k universe with overwhelming probability —
    # and would fail loudly here if they did)
    assert r.est_a == float(len(a))
    assert r.est_b == float(len(b))
    assert r.est_union == float(len(a | b))
    assert r.est_intersect == float(len(a & b))
