"""dexspark.cdc — the change-event replay engine.

Pipeline (≙ reference ingest→validate→route, SURVEY.md §3.4):

    change log (lsn, op, conv_id, turn_idx, role, text, tool, ts)
      → validate (quarantine channel)          validate.py   ≙ O4/O5/O11/O14
      → dedup latest-LSN per key               dedup.py      ≙ O16
      → merge into LakeTable                   apply.py      ≙ O9/O16
      → lineage committed with snapshot        apply.py      ≙ O13/O15
"""

from dexspark.cdc.apply import apply_changes  # noqa: F401
from dexspark.cdc.bootstrap import bootstrap_table  # noqa: F401
from dexspark.cdc.dedup import dedupe_latest  # noqa: F401
from dexspark.cdc.validate import validate_events  # noqa: F401
