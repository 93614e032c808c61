#!/usr/bin/env python3
"""Build the N-x scale corpus used for SURVEY scale evidence.

Duplicates documents/embeddings N-x with shifted ids (exact-duplicate-heavy
by construction -- the hard mode for the dedup family), densifies events
N-x PER USER (same user_id, shifted event_id and ts -- the hard mode for
the range/as-of join family: per-user pair expansion grows ~N^2), and
copies the other tables untouched. Driver-side tooling only; not part of
the library.

Usage: python3 tools/make_sfbig.py [src_dir] [dst_dir] [copies]
       (defaults /root/testdata/sf0.1 -> /tmp/sfbig, 4 copies)
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig")
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 4

# Spark cannot split a parquet file below row-group granularity; pyarrow's
# default writes ONE row group, which would serialize every scan of the
# enlarged tables into a single task and measure scan-parallelism collapse
# instead of operator scaling. 16 k rows/group ≈ the splittability a real
# lake layout has.
ROW_GROUP = 16384


def duplicate(name: str, id_col: str) -> None:
    t = pq.read_table(SRC / f"{name}.parquet")
    offset = pc.max(t[id_col]).as_py() + 1
    parts = []
    for i in range(COPIES):
        shifted = t.set_column(
            t.schema.get_field_index(id_col), id_col,
            pc.add(t[id_col], i * offset))
        parts.append(shifted)
    out = pa.concat_tables(parts)
    pq.write_table(out, DST / f"{name}.parquet", row_group_size=ROW_GROUP)
    print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


def densify_events() -> None:
    """N-x per-user event density: copy i keeps user_id/event_type but
    shifts event_id (unique) and ts by i*7s (distinct timestamps inside the
    same day-bucket/24h windows -- deepens per-user history rather than
    stretching the timeline)."""
    t = pq.read_table(SRC / "events.parquet")
    id_off = pc.max(t["event_id"]).as_py() + 1
    ts_idx = t.schema.get_field_index("ts")
    parts = []
    for i in range(COPIES):
        c = t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            pc.add(t["event_id"], i * id_off))
        shifted_ts = pc.add(t["ts"], pa.scalar(i * 7_000_000_000, pa.duration("ns")))
        c = c.set_column(ts_idx, t.schema.field("ts"), shifted_ts.cast(t.schema.field("ts").type))
        parts.append(c)
    out = pa.concat_tables(parts)
    pq.write_table(out, DST / "events.parquet", row_group_size=ROW_GROUP)
    print(f"events: {t.num_rows} -> {out.num_rows} rows ({COPIES}x per-user density)")


def main() -> None:
    DST.mkdir(parents=True, exist_ok=True)
    duplicate("documents", "doc_id")
    duplicate("embeddings", "vec_id")
    densify_events()
    for f in SRC.glob("*.parquet"):
        if f.stem not in ("documents", "embeddings", "events"):
            shutil.copy(f, DST / f.name)
            print(f"{f.stem}: copied")


if __name__ == "__main__":
    main()
