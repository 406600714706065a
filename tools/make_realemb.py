"""Regenerate the committed realistic-embedding fixture
(fixtures/realemb/embeddings.parquet) from the seeded generator and
print its digest — pair with tools/realemb_knobs.py for the
geometry evidence recorded in SCALE.md.

Usage: python tools/make_realemb.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loudml_spark.pipeline.realemb import (  # noqa: E402
    N_VECS, corpus_digest, realemb_rows, write_fixture)


def main():
    rows = realemb_rows()
    path = write_fixture()
    n_dups = sum(1 for r in rows if r[3] is not None)
    print(f"wrote {path}: {N_VECS} vecs, "
          f"{os.path.getsize(path) / 1e6:.1f} MB, "
          f"{n_dups} planted dups, digest {corpus_digest(rows)}")


if __name__ == "__main__":
    main()
