"""Driver-side property tests (no Spark) for round-3 primitives: the size
parser behind the broadcast gate, the JSON-Schema validator, and the OBO
traversal — each fuzzed against an independent reference implementation."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=1 << 40),
    st.sampled_from(["", "b", "k", "kb", "m", "mb", "g", "gb", "t", "tb"]),
)
def test_parse_size_roundtrip(n, suffix):
    from evidence_datasource_parsers_spark.operators.joins import (
        _SIZE_SUFFIXES,
        _parse_size,
    )

    mult = _SIZE_SUFFIXES.get(suffix, 1)
    assert _parse_size(f"{n}{suffix}") == n * mult
    assert _parse_size(f"  {n}{suffix.upper()} ") == n * mult


def test_parse_size_negative_and_plain():
    from evidence_datasource_parsers_spark.operators.joins import _parse_size

    assert _parse_size("-1") == -1
    assert _parse_size("10485760b") == 10485760


# random JSON documents + a schema generator that is correct by construction
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-10**6, max_value=10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=20),
)
_json = st.recursive(
    _scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=4),
        st.dictionaries(st.text(max_size=8), kids, max_size=4),
    ),
    max_leaves=20,
)


def _schema_for(value) -> dict:
    """A schema the value conforms to BY CONSTRUCTION."""
    if value is None:
        return {"type": "null"}
    if isinstance(value, bool):
        return {"type": "boolean", "const": value}
    if isinstance(value, int):
        return {"type": "integer", "minimum": value - 1, "maximum": value + 1}
    if isinstance(value, float):
        return {"type": "number"}
    if isinstance(value, str):
        return {"type": "string", "maxLength": len(value)}
    if isinstance(value, list):
        return {
            "type": "array",
            "minItems": len(value),
            "maxItems": len(value),
        }
    return {
        "type": "object",
        "required": sorted(value),
        "properties": {k: _schema_for(v) for k, v in value.items()},
    }


@settings(max_examples=200, deadline=None)
@given(_json)
def test_validator_accepts_conforming_value(value):
    from evidence_datasource_parsers_spark.validation import compile_validator

    assert compile_validator(_schema_for(value))(value) == []


@settings(max_examples=200, deadline=None)
@given(_json)
def test_validator_rejects_wrong_type(value):
    from evidence_datasource_parsers_spark.validation import compile_validator

    # every value fails a schema demanding a JSON type it cannot be:
    # strings are never integers; non-strings are never strings (note a
    # whole-number float IS a JSON-Schema integer, so "integer" is only
    # safely wrong for strings)
    wrong = {"type": "integer"} if isinstance(value, str) else {"type": "string"}
    assert compile_validator(wrong)(value) != []


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=40),
            st.integers(min_value=0, max_value=39),
        ),
        max_size=60,
    )
)
def test_obo_subclasses_match_naive_closure(edges):
    """OboOntology.subclasses == transitive closure computed naively over
    the same child→parent edges (self-loops dropped, ids stringified)."""
    from evidence_datasource_parsers_spark.sources.obo import (
        OboOntology,
        OboTerm,
    )

    edges = [(c, p) for c, p in edges if c != p]
    node_ids = {v for e in edges for v in e} | {0}
    terms = {
        str(i): OboTerm(
            id=str(i), parents=[str(p) for c, p in edges if c == i]
        )
        for i in node_ids
    }
    onto = OboOntology(terms)

    children: dict[int, set[int]] = {}
    for c, p in edges:
        children.setdefault(p, set()).add(c)

    def closure(root: int) -> set[str]:
        out, stack = {root}, [root]
        while stack:
            n = stack.pop()
            for c in children.get(n, ()):
                if c not in out:
                    out.add(c)
                    stack.append(c)
        return {str(x) for x in out}

    for root in list(node_ids)[:10]:
        assert onto.subclasses(str(root)) == closure(root)


# ---------------------------------------------------------------------------
# Two-action lineage audit (r4): re-execution of any returned frame must be
# bit-stable, and sibling outputs that share a lineage must agree with each
# other — the recurring bug class this repo guards with persist/checkpoint.
# ---------------------------------------------------------------------------


def _rows(df):
    return sorted(tuple("\0" if v is None else v for v in r) for r in df.collect())


def test_duplicate_clusters_reexecution_stable(spark):
    from evidence_datasource_parsers_spark.operators.dedupe import (
        duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (5, 6), (30, 33)],
        "id_a long, id_b long",
    )
    out = duplicate_clusters(pairs)
    first, second = _rows(out), _rows(out)  # same frame, two actions
    assert first == second
    # a fresh invocation over the same input converges identically
    assert _rows(duplicate_clusters(pairs)) == first


def test_leakage_safe_split_reexecution_stable(spark):
    from evidence_datasource_parsers_spark.operators.sampling import (
        leakage_safe_split,
    )

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    clusters = spark.createDataFrame(
        [(i, i - i % 4) for i in range(0, 100)], "doc_id long, cluster_id long"
    )
    out = leakage_safe_split(corpus, clusters)
    assert _rows(out) == _rows(out)


def test_incremental_lsh_outputs_agree(spark):
    """The two returned frames share the pinned fingerprint lineage: every
    fresh doc's fingerprints must be IN the store, and no dropped doc's
    may be — materialized in either order, twice."""
    from evidence_datasource_parsers_spark.operators.dedupe import (
        incremental_lsh_dedupe,
        lsh_fingerprints,
    )

    b1 = spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 7} with more words")
         for i in range(30)],
        "doc_id long, text string",
    )
    r1 = incremental_lsh_dedupe(b1, None, "text", "doc_id", mode="word", k=3)
    b2 = spark.createDataFrame(
        [(100 + i, f"document number {i} about topic {i % 7} with more words")
         for i in range(10)]                      # re-crawls of batch 1
        + [(500, "entirely novel content on query planners and exchanges")],
        "doc_id long, text string",
    )
    r2 = incremental_lsh_dedupe(
        b2, r1.store, "text", "doc_id", mode="word", k=3
    )
    # store first, then fresh, then both again — order must not matter
    store_rows_1 = _rows(r2.store.select("doc_id"))
    fresh_ids = {r.doc_id for r in r2.fresh.collect()}
    store_rows_2 = _rows(r2.store.select("doc_id"))
    assert store_rows_1 == store_rows_2
    assert fresh_ids == {r.doc_id for r in r2.fresh.collect()}
    store_ids = {r[0] for r in store_rows_1}
    assert fresh_ids <= store_ids                  # every survivor recorded
    assert not ({100 + i for i in range(10)} & store_ids)  # dropped absent
    r1.pinned.unpersist()
    r2.pinned.unpersist()


def test_incremental_exact_outputs_agree(spark):
    """store == prior store ∪ content hashes of the persisted fresh rows,
    under repeated materialization in interleaved order."""
    from evidence_datasource_parsers_spark.operators.dedupe import (
        content_hash,
        incremental_exact_dedupe,
    )
    from pyspark.sql import functions as F

    b1 = spark.createDataFrame(
        [(i, f"text body {i // 2}") for i in range(20)],
        "doc_id long, text string",
    )
    fresh1, store1, _ = incremental_exact_dedupe(
        b1, None, "text", "doc_id"
    )
    s1a = _rows(store1)
    f1 = _rows(fresh1)
    s1b = _rows(store1)
    assert s1a == s1b and f1 == _rows(fresh1)
    rederived = _rows(
        fresh1.select(
            F.coalesce(content_hash(F.col("text")), F.lit(-1)).alias("h")
        )
    )
    assert rederived == s1a
    fresh1.unpersist()
