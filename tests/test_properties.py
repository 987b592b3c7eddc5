"""Property-based tests (hypothesis) for the pure-Python semantics —
the pieces with the subtlest invariants (SURVEY §5 notes the reference
has no property tests at all; these go beyond its 4 golden cases).

All pure Python: no SparkSession, so this file runs in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from scratchdb_spark.ingest.flatten import (
    flatten_horizontal,
    flatten_vertical,
)
from scratchdb_spark.ingest.infer import infer_types, json_value_tag

# --- strategies -----------------------------------------------------------

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**70), max_value=2**70),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)

json_docs = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(
            st.text(
                alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6
            ),
            children,
            max_size=4,
        ),
    ),
    max_leaves=12,
)

json_objects = st.dictionaries(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6),
    json_docs,
    max_size=4,
)


def _count_scalars(value, in_empty=False) -> int:
    """Scalar leaves reachable without passing through an empty
    container (empty dict/list contribute nothing horizontally)."""
    if isinstance(value, dict):
        return sum(_count_scalars(v) for v in value.values())
    if isinstance(value, list):
        return sum(_count_scalars(v) for v in value)
    return 1


# --- horizontal flatten ---------------------------------------------------


@given(json_objects)
@settings(max_examples=150, deadline=None)
def test_horizontal_single_row_and_leaf_count(doc):
    rows = flatten_horizontal(doc)
    assert len(rows) == 1
    row = rows[0]
    # every value in the flat row is a scalar
    assert all(not isinstance(v, (dict, list)) for v in row.values())
    # leaf preservation: distinct paths can collide ({'a':{'b':1},'a_b':2}),
    # so the flat row has at most the leaf count, and at least one key
    # whenever a scalar leaf exists
    n_leaves = _count_scalars(doc)
    assert len(row) <= n_leaves
    assert (len(row) > 0) == (n_leaves > 0)


@given(json_objects)
@settings(max_examples=150, deadline=None)
def test_horizontal_is_deterministic(doc):
    assert flatten_horizontal(doc) == flatten_horizontal(doc)


# --- vertical flatten -----------------------------------------------------


@given(json_objects)
@settings(max_examples=150, deadline=None)
def test_vertical_row_count_is_product_of_sibling_arrays(doc):
    rows = flatten_vertical(doc, document_id="fixed")
    # at least one row always (scalars broadcast; empty arrays -> NULL row)
    assert len(rows) >= 1
    # all rows share the document id
    assert {r["___document_id"] for r in rows} == {"fixed"}
    # no row contains a container value
    for r in rows:
        assert all(not isinstance(v, (dict, list)) for v in r.values())


@given(
    st.lists(scalars, min_size=0, max_size=4),
    st.lists(scalars, min_size=0, max_size=4),
)
@settings(max_examples=150, deadline=None)
def test_vertical_sibling_cross_product(a, b):
    rows = flatten_vertical({"a": a, "b": b}, document_id="d")
    expect = max(1, len(a)) * max(1, len(b))
    assert len(rows) == expect
    if a and b:
        # order columns enumerate the full cross product
        pairs = {(r["__order_a"], r["__order_b"]) for r in rows}
        assert pairs == {
            (i, j) for i in range(len(a)) for j in range(len(b))
        }


# --- type vote ------------------------------------------------------------


@given(st.lists(scalars, min_size=1, max_size=30))
@settings(max_examples=300, deadline=None)
def test_vote_follows_priority(values):
    rows = [{"c": v} for v in values]
    tags = {json_value_tag(v) for v in values} - {"null"}
    got = infer_types(rows)["c"]
    if not tags:
        assert got == "string"  # all-null -> string
    else:
        for t in ("string", "undefined", "float", "int", "bool"):
            if t in tags:
                assert got == t
                break


@given(st.integers(min_value=-(2**80), max_value=2**80))
def test_int64_overflow_tags_float(x):
    expected = "int" if -(2**63) <= x <= 2**63 - 1 else "float"
    assert json_value_tag(x) == expected


@given(st.lists(scalars, min_size=1, max_size=30))
@settings(max_examples=150, deadline=None)
def test_vote_is_order_invariant(values):
    fwd = infer_types([{"c": v} for v in values])["c"]
    rev = infer_types([{"c": v} for v in reversed(values)])["c"]
    assert fwd == rev


# --- deterministic split (pure-python mirror) ------------------------------


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=50))
@settings(max_examples=100, deadline=None)
def test_split_buckets_match_md5_definition(ids):
    """The md5-bucket definition used by operators/split.py, computed
    in pure python, is total and stable: same key -> same bucket."""
    import hashlib

    def bucket(key: int) -> int:
        return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 100

    for k in ids:
        b = bucket(k)
        assert 0 <= b < 100
        assert b == bucket(k)


# --- manifest file-skipping completeness ---------------------------------
#
# The contract that makes zone-map pruning safe: a file the decision
# SKIPS can contain no row matching the predicate. Completeness is
# checked against brute-force evaluation over the very values the
# stats were derived from (pure Python; the Spark integration path is
# covered in tests/test_ingest_pipeline.py).

file_values = st.lists(
    st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    max_size=12,
)
bound = st.one_of(st.none(), st.integers(min_value=-60, max_value=60))


def _stats_of(vals):
    """Mirror snapshots._file_stats for one file's value list."""
    nn = [v for v in vals if v is not None]
    rng = [min(nn), max(nn)] if nn else [None, None]
    rec = {"k": rng}
    if len(set(nn)) <= 64:
        rec["k__dict"] = sorted(set(nn))
    return rec


@settings(max_examples=300)
@given(vals=file_values, lo=bound, hi=bound)
def test_range_prune_never_drops_matching_rows(vals, lo, hi):
    from scratchdb_spark.snapshots import _range_survives

    rec = _stats_of(vals)
    matches = [
        v
        for v in vals
        if v is not None
        and (lo is None or v >= lo)
        and (hi is None or v <= hi)
    ]
    if matches:
        assert _range_survives(rec["k"], lo, hi), (vals, lo, hi)
    # and pruning is effective on disjoint ranges: a file strictly
    # outside a closed predicate range is skipped
    nn = [v for v in vals if v is not None]
    if nn and lo is not None and hi is not None and (
        max(nn) < lo or min(nn) > hi
    ):
        assert not _range_survives(rec["k"], lo, hi)


@settings(max_examples=300)
@given(vals=file_values, probe=st.integers(min_value=-60, max_value=60))
def test_eq_prune_never_drops_matching_rows(vals, probe):
    from scratchdb_spark.snapshots import _eq_survives

    rec = _stats_of(vals)
    if probe in vals:
        assert _eq_survives(rec, "k", probe), (vals, probe)
    else:
        # with a dict recorded, the skip is EXACT: absent value ->
        # file never planned
        if "k__dict" in rec:
            assert not _eq_survives(rec, "k", probe)
    # no stats recorded at all -> always scan
    assert _eq_survives({}, "k", probe)
    from scratchdb_spark.snapshots import _range_survives

    assert _range_survives(None, None, None)


@settings(max_examples=300)
@given(
    vals=file_values,
    probes=st.lists(
        st.integers(min_value=-60, max_value=60),
        min_size=1,
        max_size=6,
    ),
)
def test_eq_prune_in_list_never_drops_matching_rows(vals, probes):
    """IN-list form of _eq_survives (used by the ANN index's
    multi-cell probe planning): the file survives iff ANY probed
    value could live in it, and with a dict recorded the skip is
    EXACT — equivalent to OR-ing the single-value decisions."""
    from scratchdb_spark.snapshots import _eq_survives

    rec = _stats_of(vals)
    single = any(_eq_survives(rec, "k", p) for p in probes)
    assert _eq_survives(rec, "k", probes) == single
    if any(p in vals for p in probes):
        assert _eq_survives(rec, "k", probes)
    elif "k__dict" in rec:
        assert not _eq_survives(rec, "k", probes)
    assert _eq_survives({}, "k", probes)


# --- r14: vectorized above-cap bloom probing -------------------------


def _mk_bloom(values, m=4096, k=3):
    import base64

    from scratchdb_spark.snapshots import _bloom_positions

    bits = bytearray(m // 8)
    for v in values:
        for p in _bloom_positions(v, m, k):
            bits[p >> 3] |= 1 << (p & 7)
    return {
        "m": m,
        "k": k,
        "b": base64.b64encode(bytes(bits)).decode(),
    }


@settings(max_examples=200, deadline=None)
@given(
    members=st.sets(
        st.one_of(
            st.integers(min_value=-10**9, max_value=10**9),
            st.text(min_size=0, max_size=8),
        ),
        max_size=40,
    ),
    probes=st.sets(
        st.one_of(
            st.integers(min_value=-10**9, max_value=10**9),
            st.text(min_size=0, max_size=8),
        ),
        min_size=1,
        max_size=40,
    ),
)
def test_bloom_vec_matches_loop(members, probes):
    """r14: the vectorized bloom test must be BIT-IDENTICAL to the
    per-value loop on every (bitmap, probe-set) pair — same false
    positives, same definite misses — since above the loop cap it
    becomes the skip decision."""
    from scratchdb_spark.snapshots import (
        _bloom_test,
        _bloom_test_vec,
        _EqValues,
    )

    bl = _mk_bloom(members)
    assert _bloom_test_vec(bl, _EqValues(probes)) == _bloom_test(
        bl, probes
    )
    # every member is found (no false negatives, ever)
    if members:
        assert _bloom_test_vec(bl, _EqValues(members))


def test_eq_survives_bloom_skips_above_loop_cap():
    """r14 (r13 advisory): on a bloom-only stat record (saturated
    dict, wide range) a probe ABOVE _EQ_BLOOM_PROBE_CAP used to skip
    the bloom test wholesale and keep ~every file; now it vectorizes.
    Probes built by rejection against the per-value loop, so the skip
    expectation is deterministic (no false-positive flakes)."""
    from scratchdb_spark.snapshots import (
        _EQ_BLOOM_PROBE_CAP,
        _EQ_BLOOM_VEC_CAP,
        _bloom_test,
        _eq_survives,
    )

    members = list(range(1000))
    bl = _mk_bloom(members)
    # wide range, no dict: only the bloom can skip
    rec = {"k": [-10**9, 10**9], "k__bloom": bl}

    absent, cand = [], 10**6
    while len(absent) <= _EQ_BLOOM_PROBE_CAP:
        if not _bloom_test(bl, [cand]):
            absent.append(cand)
        cand += 1
    assert len(absent) > _EQ_BLOOM_PROBE_CAP  # really above the cap
    assert len(absent) <= _EQ_BLOOM_VEC_CAP
    assert not _eq_survives(rec, "k", absent)  # definite miss: skip
    # one present member anywhere in the huge probe -> must survive
    assert _eq_survives(rec, "k", absent + [members[0]])
    # and beyond the vectorized cap the range check (sound) decides
    import scratchdb_spark.snapshots as snap

    old = snap._EQ_BLOOM_VEC_CAP
    try:
        snap._EQ_BLOOM_VEC_CAP = len(absent) - 1
        assert _eq_survives(rec, "k", absent)  # falls to range: keep
    finally:
        snap._EQ_BLOOM_VEC_CAP = old
