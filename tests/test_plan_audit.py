"""Unit tests for the plan-audit classifier (tools/plan_audit.py) —
pure plan-string parsing, no SparkSession.  The sweep itself runs as a
tool (`python tools/plan_audit.py`); these pin the classification
rules it rests on."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.plan_audit import _unbounded_bnlj, audit_one  # noqa: E402

BOUNDED_TOTAL = """\
*(3) Project [a#1L]
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- FileScan parquet [a#1L] Batched: true
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
      +- HashAggregate(keys=[], functions=[sum(x#2L)], output=[t#3L])
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=0]
            +- FileScan parquet [x#2L] Batched: true
"""

DATA_SIZED_THETA = """\
*(3) Project [a#1L]
+- BroadcastNestedLoopJoin BuildRight, Inner, (a#1L < b#2L)
   :- FileScan parquet [a#1L] Batched: true
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
      +- Filter isnotnull(b#2L)
         +- FileScan parquet [b#2L] Batched: true
"""

# a BroadcastExchange nested inside the STREAMED child must not vouch
# for the outer BNLJ's (data-sized) build side
NESTED_DECOY = """\
*(4) Project [a#1L]
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- BroadcastHashJoin [k#5L], [k#6L], Inner, BuildRight, false
   :  :- FileScan parquet [a#1L,k#5L] Batched: true
   :  +- BroadcastExchange HashedRelationBroadcastMode, [plan_id=2]
   :     +- HashAggregate(keys=[], functions=[max(x#7L)], output=[m#8L])
   :        +- FileScan parquet [x#7L] Batched: true
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=3]
      +- FileScan parquet [b#2L] Batched: true
"""

LITERAL_BUILDS = """\
*(2) Project [a#1L]
+- BroadcastNestedLoopJoin BuildRight, Inner, ((p#1 >= lo#2) AND (p#1 < hi#3))
   :- FileScan parquet [p#1] Batched: true
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
      +- Scan ExistingRDD[band#0,lo#2,hi#3]
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- FileScan parquet [q#4] Batched: true
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=2]
      +- Project [id#5L AS i#6L]
         +- Range (0, 4, step=1, splits=32)
"""

# the reuse resolves to an original exchange whose build is a global
# (keys=[]) aggregate — bounded at the ORIGINAL site, so the reuse is
REUSED_BOUNDED = """\
*(5) Project [v#1]
+- BroadcastNestedLoopJoin BuildRight, Cross, (v#1 > t#2)
   :- * Project [v#1]
   :  +- BroadcastNestedLoopJoin BuildRight, Cross
   :     :- FileScan parquet [v#1] Batched: true
   :     +- BroadcastExchange IdentityBroadcastMode, [plan_id=9]
   :        +- HashAggregate(keys=[], functions=[sum(x#3L)], output=[t#2])
   :           +- FileScan parquet [x#3L] Batched: true
   +- ReusedExchange [t#2], BroadcastExchange IdentityBroadcastMode, [plan_id=9]
"""

# a reuse of a DATA-SIZED exchange originally built for a
# BroadcastHashJoin: the original site is never swept (BHJ builds are
# legitimate), so the reusing BNLJ must NOT be taken on faith
REUSED_DATA_SIZED = """\
*(5) Project [v#1]
+- BroadcastNestedLoopJoin BuildRight, Cross, (v#1 > d#2)
   :- * BroadcastHashJoin [k#3L], [k#4L], Inner, BuildRight, false
   :  :- FileScan parquet [v#1,k#3L] Batched: true
   :  +- BroadcastExchange HashedRelationBroadcastMode(input[0]), [plan_id=7]
   :     +- Filter isnotnull(k#4L)
   :        +- FileScan parquet [d#2,k#4L] Batched: true
   +- ReusedExchange [d#2, k#4L], BroadcastExchange HashedRelationBroadcastMode(input[0]), [plan_id=7]
"""

UDTF = """\
+- BatchEvalPythonUDTF ngrams(text#1)#2, [text#1, gram#3]
   +- FileScan parquet [text#1] Batched: true
"""

ROW_UDF = """\
+- BatchEvalPython [f(x#1)#2], [x#1, y#2]
   +- FileScan parquet [x#1] Batched: true
"""


def test_bounded_total_is_clean():
    assert _unbounded_bnlj(BOUNDED_TOTAL) == 0
    assert audit_one(BOUNDED_TOTAL) == {}


def test_data_sized_theta_flags():
    assert _unbounded_bnlj(DATA_SIZED_THETA) == 1
    assert audit_one(DATA_SIZED_THETA) == {"BroadcastNestedLoopJoin": 1}


def test_nested_exchange_does_not_vouch():
    assert _unbounded_bnlj(NESTED_DECOY) == 1


def test_literal_and_small_range_builds_are_bounded():
    assert _unbounded_bnlj(LITERAL_BUILDS) == 0


def test_reused_exchange_resolves_to_original_site():
    assert _unbounded_bnlj(REUSED_BOUNDED) == 0
    assert _unbounded_bnlj(REUSED_DATA_SIZED) == 1


def test_udtf_reported_under_its_own_key():
    assert audit_one(UDTF) == {"BatchEvalPythonUDTF": 1}


def test_row_at_a_time_udf_flags():
    assert audit_one(ROW_UDF) == {"BatchEvalPython": 1}
