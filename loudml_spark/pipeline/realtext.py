"""Zipf/hapax-realistic text fixture for the text/corpus family.

The synthetic ``documents`` table draws ~40 content words uniformly,
so its bigram table has almost no hapax mass — the regime the
bigram ``min_count`` pruning knob, the BPE trainer's merge budget,
and the Gopher/CCNet thresholds were built for never fires there
(SCALE.md has conceded this since r10; the reference's analogous
realism fixture is the real NAB series in its example model,
/root/reference/examples/model-donut-asg.json:3-18).  This module
generates a corpus with the statistical shape of real crawled text
and NO randomness at import/query time: one seeded
``random.Random`` stream (CPython guarantees its values across
versions), so the committed parquet fixture is reproducible
bit-for-bit from the generator.

What makes it "real-shaped":

* **Zipf–Mandelbrot unigrams**: ranks sampled with
  P(r) ∝ 1/(r+q)^s, s=1.35, q=3.0 (tuned — ``ZIPF_S``/``ZIPF_Q``)
  over a 100k-type vocabulary —
  Heaps-law type growth, a fat hapax tail (60–80% of distinct
  bigrams occur once, the property that makes ``min_count`` pruning
  pay on real text).
* **Function-word heads**: the top ranks are real English (or
  German, per doc lang) function words, so language-ID markers,
  stopword-based Gopher rules and fertility-by-lang audits all see
  the distribution they were written for.
* **Quality spectrum**: a seeded minority of documents carry the
  standard crawl defects — symbol spam (``#``/``...``), template
  loops (one sentence repeated), numeric junk, stubs — at rates
  that differ by source, so Gopher/CCNet/C4 hit rates are
  non-degenerate and per-source rates differ.
* **Compounding `de` slice**: German-tagged docs glue content
  pairs into compounds, so a shared BPE merge list fragments them
  harder — the fertility inequity the Ács-2019 audit exists to
  measure.

Schema matches the driver's ``documents`` table:
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

import bisect
import math
import random
from typing import Iterable

SEED = 11
N_DOCS = 6000
V_MAX = 50_000           # Zipf support (content ranks)
ZIPF_S = 1.35            # tuned so the 6000-doc corpus lands at
ZIPF_Q = 3.0             # ~0.8 bigram-hapax / ~0.7 unigram-hapax
#                          share (tools/make_realtext.py prints the
#                          measured values; real crawls: 0.6-0.8)

# real function words head the rank order; en markers the/a/of/and
# and de markers der/die/und/das (pipeline/text.py LANG_MARKERS)
# must be present so lang-ID and stopword rules see real mass
_FUNC = {
    "en": ("the", "of", "and", "a", "to", "in", "is", "was", "that",
           "for", "it", "on", "as", "with", "be", "by", "at", "are",
           "this", "have", "from", "or", "had", "not", "but", "what",
           "all", "were", "when", "we", "there", "can", "an", "which",
           "their", "if", "do", "will", "each", "about", "how", "up",
           "out", "them", "then", "she", "many", "some", "so", "these"),
    "de": ("der", "die", "und", "das", "in", "von", "zu", "den",
           "mit", "auf", "ist", "im", "dem", "nicht", "ein", "eine",
           "als", "auch", "es", "an", "werden", "aus", "er", "hat",
           "dass", "sie", "nach", "wird", "bei", "einer", "um", "am",
           "sind", "noch", "wie", "einem", "über", "einen", "so",
           "zum", "war", "haben", "nur", "oder", "aber", "vor",
           "zur", "bis", "mehr", "durch"),
}

_SYL = ("ta", "ri", "mo", "sen", "ka", "lu", "ve", "dor", "ni",
        "pel", "sha", "gu", "ren", "ba", "tis", "or", "ma", "lin",
        "fo", "cu")

_SOURCES = ("web", "books", "wiki")
# defect probabilities (symbol spam, loop, junk, stub) per source —
# the web slice is dirtiest, books cleanest
_DEFECTS = {
    "web": (0.08, 0.07, 0.04, 0.04),
    "books": (0.01, 0.01, 0.00, 0.01),
    "wiki": (0.03, 0.03, 0.01, 0.02),
}


def _content_word(rank: int) -> str:
    """Deterministic rank → pseudo-word (base-20 syllable digits,
    min two syllables so content words are 4+ chars)."""
    s = _SYL[rank % 20]
    r = rank // 20
    s += _SYL[r % 20]
    r //= 20
    while r:
        s += _SYL[r % 20]
        r //= 20
    return s


class _ZipfSampler:
    """Zipf–Mandelbrot rank sampler over 1..V_MAX via inverse-CDF
    bisect on a seeded uniform stream — pure Python, portable."""

    _cdf: list[float] | None = None

    @classmethod
    def cdf(cls) -> list[float]:
        if cls._cdf is None:
            weights = [1.0 / (r + ZIPF_Q) ** ZIPF_S
                       for r in range(1, V_MAX + 1)]
            total = math.fsum(weights)
            acc, out = 0.0, []
            for w in weights:
                acc += w
                out.append(acc / total)
            cls._cdf = out
        return cls._cdf

    def __init__(self, rng: random.Random):
        self._rng = rng
        self._c = self.cdf()

    def rank(self) -> int:
        return bisect.bisect_left(self._c, self._rng.random())


def _word_for(lang: str, rank: int, rng: random.Random) -> str:
    func = _FUNC[lang]
    if rank < len(func):
        return func[rank]
    if lang == "de" and rng.random() < 0.35:
        # compounding: glue a second content draw on — longer
        # types, the fertility-audit regime
        other = len(func) + int(rng.random() * 4000)
        return _content_word(rank) + _content_word(other)
    return _content_word(rank)


def _sentence(lang: str, z: _ZipfSampler, rng: random.Random,
              n_words: int) -> str:
    ws = []
    for i in range(n_words):
        w = _word_for(lang, z.rank(), rng)
        if i == 0:
            w = w[:1].upper() + w[1:]
        elif i < n_words - 1 and rng.random() < 0.07:
            w += ","
        ws.append(w)
    return " ".join(ws) + "."


def realtext_rows(n_docs: int = N_DOCS, seed: int = SEED) -> list:
    """The corpus as (doc_id, text, lang, source, n_chars) tuples —
    deterministic for (n_docs, seed)."""
    rng = random.Random(seed)
    z = _ZipfSampler(rng)
    rows = []
    for doc_id in range(n_docs):
        u = rng.random()
        source = (_SOURCES[0] if u < 0.60
                  else _SOURCES[1] if u < 0.85 else _SOURCES[2])
        lang = "de" if rng.random() < 0.20 else "en"
        p_sym, p_loop, p_junk, p_stub = _DEFECTS[source]
        defect = rng.random()
        n_words = max(8, min(1500, int(math.exp(rng.gauss(5.0, 0.9)))))
        if defect < p_stub:
            n_words = 8 + int(rng.random() * 12)       # < 25 words
        sentences = []
        remaining = n_words
        while remaining > 0:
            sl = min(remaining, 5 + int(rng.random() * 18))
            sentences.append(_sentence(lang, z, rng, sl))
            remaining -= sl
        if defect < p_sym:
            # symbol spam: hashtags and ellipses sprinkled through
            sentences = [
                s.replace(" ", " #", 1) + " ..." for s in sentences]
        elif defect < p_sym + p_loop:
            # template loop: first sentence repeated (C4/repetition
            # and TTR ground truth)
            sentences = [sentences[0]] * len(sentences)
        elif defect < p_sym + p_loop + p_junk:
            # numeric junk: alphabetic mass collapses
            njr = rng.random()
            sentences = [
                " ".join(str(int(njr * 10 ** 9) + i * j)
                         for j in range(10)) + "."
                for i, _ in enumerate(sentences)]
        text = " ".join(sentences)
        rows.append((doc_id, text, lang, source, len(text)))
    return rows


def realtext_fixture_path() -> str:
    """Absolute path of the committed parquet fixture (stable under
    repo relocation — derived from this file's location)."""
    import os

    return os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "..", "fixtures",
        "realtext.parquet"))


def write_fixture(path: str | None = None,
                  n_docs: int = N_DOCS, seed: int = SEED) -> str:
    """(Re)generate the parquet fixture from the generator — used by
    tools/make_realtext.py and the freshness test."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = path or realtext_fixture_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = realtext_rows(n_docs, seed)
    cols = list(zip(*rows))
    table = pa.table({
        "doc_id": pa.array(cols[0], pa.int64()),
        "text": pa.array(cols[1], pa.string()),
        "lang": pa.array(cols[2], pa.string()),
        "source": pa.array(cols[3], pa.string()),
        "n_chars": pa.array(cols[4], pa.int64()),
    })
    pq.write_table(table, path, compression="zstd")
    return path


def load_realtext(spark):
    """The fixture as a DataFrame — the committed parquet, so catalog
    queries and their DuckDB oracles read the same bytes."""
    return spark.read.parquet(realtext_fixture_path())


def corpus_digest(rows: Iterable) -> str:
    """Order-sensitive md5 over the row tuples — the freshness gate
    ties the committed parquet to the generator."""
    import hashlib

    h = hashlib.md5()
    for r in rows:
        h.update(repr(tuple(r)).encode())
    return h.hexdigest()
