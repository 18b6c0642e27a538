"""dexspark.lake — a minimal ACID snapshot table format over parquet.

No Iceberg/Delta runtime jar is available in this environment, so the
engine carries its own (deliberately small) lake-table layer with the
four properties the CDC engine needs:

1. **Atomic commits** — a table version is a single JSON manifest file
   published create-if-absent through the pluggable CommitStore
   (lake/commitstore.py: POSIX link(2) by default, an object-store
   staged-PUT + CAS-pointer protocol for S3/GCS); readers see either
   the old or the new snapshot, never a partial write (same idea as
   Iceberg's metadata pointer swap).
2. **Bucketed copy-on-write MERGE** — data files are hash-bucketed by
   key; a merge rewrites only the buckets its batch touches, so merge
   cost scales with batch locality, not table size (≙ Iceberg partition
   -level COW; this is what keeps 10^10-event replay feasible).
3. **Schema evolution** — additive columns and int→long/float→double
   widening; each data file records the schema id it was written with
   and is projected/cast to the current schema on read.
4. **Lineage in the commit** — the manifest `summary` carries batch_id
   + per-bucket applied/rejected counts, making the data write and the
   metrics write one atomic operation (solves the exactly-once
   double-write problem; see SURVEY.md §7 "hard parts (a)").

Reference parity: this layer plays the role of the destination blob
store + staged-prefix topology of the reference router
(ingestion-routing/resources/storageaccounts/dexrsdestinationstorage,
RouteIngestedFile.kt:57-75) — buckets ≙ staged prefixes, manifest
summary ≙ stamped metadata/lineage.
"""

from dexspark.lake.table import LakeTable  # noqa: F401
from dexspark.lake.matview import (  # noqa: F401
    AggViewSpec,
    create_agg_view,
    refresh_agg_view,
)
from dexspark.lake.sigindex import (  # noqa: F401
    SigIndexSpec,
    create_signature_index,
    ingest_dedup_gate,
    near_dup_pairs_via_index,
    refresh_signature_index,
)
from dexspark.lake.vecindex import (  # noqa: F401
    VecIndexSpec,
    create_vector_index,
    ivf_topk_via_index,
    refresh_vector_index,
)
