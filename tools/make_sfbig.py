#!/usr/bin/env python3
"""Build the 4x scale corpus used for SURVEY §6.6 scale evidence.

Duplicates documents/embeddings 4x with shifted ids (exact-duplicate-heavy
by construction -- the hard mode for the dedup family) and copies the other
tables untouched. Driver-side tooling only; not part of the library.

Usage: python3 tools/make_sfbig.py [src_dir] [dst_dir]
       (defaults /root/testdata/sf0.1 -> /tmp/sfbig)
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 4
SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig")


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
    pq.write_table(out, DST / f"{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


def main() -> None:
    DST.mkdir(parents=True, exist_ok=True)
    duplicate("documents", "doc_id")
    duplicate("embeddings", "vec_id")
    for f in SRC.glob("*.parquet"):
        if f.stem not in ("documents", "embeddings"):
            shutil.copy(f, DST / f.name)
            print(f"{f.stem}: copied")


if __name__ == "__main__":
    main()
