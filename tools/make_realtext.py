"""Regenerate the committed real-text fixture
(fixtures/realtext.parquet) from the seeded generator and print its
corpus statistics — the realism evidence for SCALE.md.

Usage: python tools/make_realtext.py [n_docs]
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loudml_spark.pipeline.realtext import (  # noqa: E402
    N_DOCS, corpus_digest, realtext_rows, write_fixture)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else N_DOCS
    rows = realtext_rows(n_docs)
    path = write_fixture(n_docs=n_docs)
    print(f"wrote {path}: {n_docs} docs, "
          f"{os.path.getsize(path) / 1e6:.1f} MB, "
          f"digest {corpus_digest(rows)}")

    # realism statistics: the properties the knobs exist for
    tok = re.compile(r"[a-zäöüß]+")
    uni = collections.Counter()
    big = collections.Counter()
    n_tokens = 0
    for _, text, _, _, _ in rows:
        ws = tok.findall(text.lower())
        n_tokens += len(ws)
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    hap_u = sum(1 for c in uni.values() if c == 1)
    hap_b = sum(1 for c in big.values() if c == 1)
    print(f"tokens={n_tokens} types={len(uni)} "
          f"unigram-hapax-share={hap_u / len(uni):.3f}")
    print(f"distinct-bigrams={len(big)} "
          f"bigram-hapax-share={hap_b / len(big):.3f} "
          f"(real text: 0.6-0.8)")
    top = ", ".join(w for w, _ in uni.most_common(8))
    print(f"top unigrams: {top}")
    by_src = collections.Counter(r[3] for r in rows)
    by_lang = collections.Counter(r[2] for r in rows)
    print(f"sources={dict(by_src)} langs={dict(by_lang)}")


if __name__ == "__main__":
    main()
