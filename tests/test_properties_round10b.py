"""Property-based tests (hypothesis) for the round-10b operators —
pure-math properties explored driver-side on arbitrary inputs, with
one pinned Spark case per operator elsewhere in the suite
(test_curation_round10b.py) proving the Column/DataFrame form
computes the same function.
"""

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

# ------------------------------------------------ sign codes / hamming


def _py_sign_words(vec):
    words = []
    for j in range((len(vec) + 31) // 32):
        w = 0
        for k, v in enumerate(vec[32 * j:32 * j + 32]):
            if v > 0:
                w |= 1 << k
        words.append(w)
    return words


def _py_hamming(a, b):
    return sum(bin(x ^ y).count("1")
               for x, y in zip(_py_sign_words(a), _py_sign_words(b)))


VEC = st.lists(
    st.floats(min_value=-10, max_value=10,
              allow_nan=False, allow_infinity=False, width=32),
    min_size=64, max_size=64)


@given(a=VEC, b=VEC, c=VEC)
@settings(max_examples=150, deadline=None)
def test_hamming_is_a_metric(a, b, c):
    """Sign-code hamming distance is symmetric, zero on identity, and
    satisfies the triangle inequality — the properties the rerank
    shortlist relies on."""
    assert _py_hamming(a, a) == 0
    assert _py_hamming(a, b) == _py_hamming(b, a)
    assert _py_hamming(a, c) <= _py_hamming(a, b) + _py_hamming(b, c)


@given(a=VEC)
@settings(max_examples=100, deadline=None)
def test_sign_words_stay_in_32_bits(a):
    for w in _py_sign_words(a):
        assert 0 <= w < 2**32


# -------------------------------------------------------------- RRF


def _py_rrf(runs, k0=60):
    """runs: list of dicts id -> rank."""
    ids = set().union(*[set(r) for r in runs])
    out = {}
    for i in ids:
        s = 0.0
        for r in runs:
            if i in r:
                s += round(1.0 / (k0 + r[i]), 6)
        out[i] = round(s, 6)
    return out


RUN = st.lists(st.integers(min_value=0, max_value=30),
               min_size=1, max_size=10, unique=True)


@given(a=RUN, b=RUN)
@settings(max_examples=150, deadline=None)
def test_rrf_run_order_invariant_and_bounded(a, b):
    ra = {i: r + 1 for r, i in enumerate(a)}
    rb = {i: r + 1 for r, i in enumerate(b)}
    ab, ba = _py_rrf([ra, rb]), _py_rrf([rb, ra])
    assert ab == ba
    for i, s in ab.items():
        n_runs = (i in ra) + (i in rb)
        assert 0 < s <= n_runs * round(1 / 61, 6) + 1e-12


@given(a=RUN)
@settings(max_examples=100, deadline=None)
def test_rrf_better_rank_never_scores_lower(a):
    ra = {i: r + 1 for r, i in enumerate(a)}
    out = _py_rrf([ra])
    ordered = sorted(ra, key=ra.get)
    scores = [out[i] for i in ordered]
    assert scores == sorted(scores, reverse=True)


# -------------------------------------------------------------- HLL


def _py_hll_regs(keys, p):
    m = 1 << p
    regs = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        reg, w = h % m, h // m
        rho = (60 - p) - w.bit_length() + 1 if w > 0 else (60 - p) + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9),
                  min_size=1, max_size=400),
    n_shards=st.integers(min_value=1, max_value=5),
    p=st.sampled_from([4, 5, 6]),
)
@settings(max_examples=100, deadline=None)
def test_hll_register_merge_is_shard_invariant(keys, n_shards, p):
    """Register-max over ANY sharding of the keys equals the direct
    single-pass registers — the distributive property the merged and
    streaming catalog queries rely on (duplicates across shards
    change nothing)."""
    direct = _py_hll_regs(keys, p)
    shards = [[] for _ in range(n_shards)]
    for i, k in enumerate(keys):
        shards[i % n_shards].append(k)
        shards[(i * 7) % n_shards].append(k)  # overlap on purpose
    merged = {}
    for sh in shards:
        for reg, rho in _py_hll_regs(sh, p).items():
            merged[reg] = max(merged.get(reg, 0), rho)
    assert merged == direct


@given(
    n=st.integers(min_value=1, max_value=3000),
    p=st.sampled_from([4, 5, 6]),
)
@settings(max_examples=60, deadline=None)
def test_hll_estimate_positive_and_reasonable(n, p):
    """The finished estimate (exact-int harmonic sum + linear
    counting) stays positive and within a generous error band at
    every size — no regime where the estimator collapses."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}[m]
    c_exp = (60 - p) + 1
    regs = _py_hll_regs(range(n), p)
    sum_int = sum(1 << (c_exp - r) for r in regs.values())
    sum_int += (m - len(regs)) * (1 << c_exp)
    raw = alpha * m * m * float(1 << c_exp) / sum_int
    zeros = m - len(regs)
    est = (m * math.log(m / zeros)
           if raw <= 2.5 * m and zeros > 0 else raw)
    assert est > 0
    sigma = 1.04 / math.sqrt(m)
    assert abs(est - n) / n < max(6 * sigma, 3 / n + 0.8)


# ------------------------------------------------------- kmv jaccard


@given(
    na=st.integers(min_value=1, max_value=60),
    nb=st.integers(min_value=1, max_value=60),
    overlap=st.integers(min_value=0, max_value=60),
)
@settings(max_examples=100, deadline=None)
def test_kmv_jaccard_exact_when_union_fits_k(na, nb, overlap):
    """With k >= |A ∪ B| the union sketch IS the union, so the
    estimate equals exact Jaccard — the small-set anchor."""
    shared = [f"s{i}" for i in range(overlap)]
    a = set(shared + [f"a{i}" for i in range(na)])
    b = set(shared + [f"b{i}" for i in range(nb)])
    k = 256

    def h(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    sa = set(sorted(a, key=h)[:k])
    sb = set(sorted(b, key=h)[:k])
    union_sketch = sorted(sa | sb, key=h)[:k]
    both = sum(1 for x in union_sketch if x in sa and x in sb)
    est = both / len(union_sketch)
    exact = len(a & b) / len(a | b)
    assert abs(est - exact) < 1e-12


# ------------------------------------------------------------ kalman


@given(
    ys=st.lists(st.floats(min_value=-100, max_value=100,
                          allow_nan=False, allow_infinity=False),
                min_size=2, max_size=40),
    q=st.sampled_from([0.01, 0.1, 1.0]),
    r=st.sampled_from([0.5, 1.0, 25.0]),
)
@settings(max_examples=100, deadline=None)
def test_kalman_gain_and_variance_laws(ys, q, r):
    """The filter recursion's invariants: gain in (0, 1], variance
    positive and monotonically approaching the Riccati fixed point,
    level always between the prior level and the observation."""
    lvl, p_ = ys[0], r
    # posterior-covariance fixed point: P = r(P+q)/(P+q+r)
    p_star = (-q + math.sqrt(q * q + 4 * q * r)) / 2.0
    prev_gap = None
    for y in ys[1:]:
        p_pred = p_ + q
        k = p_pred / (p_pred + r)
        assert 0 < k <= 1
        new_lvl = lvl + k * (y - lvl)
        assert min(lvl, y) - 1e-9 <= new_lvl <= max(lvl, y) + 1e-9
        lvl = new_lvl
        p_ = (1 - k) * p_pred
        assert p_ > 0
        gap = abs(p_ - p_star)
        if prev_gap is not None:
            assert gap <= prev_gap + 1e-9
        prev_gap = gap


# ---------------------------------------------------------- triangle


@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=8),
                  st.integers(min_value=0, max_value=8)),
        min_size=0, max_size=25),
)
@settings(max_examples=150, deadline=None)
def test_triangle_per_node_counts_sum_to_3x_total(edges):
    """Brute-force reference: Σ per-node triangle counts = 3 × the
    number of distinct triangles, and each coefficient is in [0, 1]."""
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({x for p in e for x in p})
    adj = {n: {b if a == n else a for a, b in e if n in (a, b)}
           for n in nodes}
    tris = {tuple(sorted((a, b, c)))
            for a, b in e for c in adj[a] & adj[b]}
    per_node = {n: sum(1 for t in tris if n in t) for n in nodes}
    assert sum(per_node.values()) == 3 * len(tris)
    for n in nodes:
        d = len(adj[n])
        coeff = 2 * per_node[n] / (d * (d - 1)) if d >= 2 else 0.0
        assert 0.0 <= coeff <= 1.0 + 1e-12
