"""OBO ontology ingestion (stdlib, driver-side) — parity with the
reference's pronto usage (``modules/IMPC.py:307-317``: load the MP
ontology, take the direct children of the root as "high-level classes",
and map every term to the high-level classes it descends from).

Driver-side by design, like the reference: ontologies are curated
dimension data (10⁴–10⁶ terms), entering Spark through ``from_rows`` as a
broadcastable lookup — fact data never flows through this path.

The parser covers the OBO 1.2/1.4 constructs real ontologies (MP, HP,
GO, EFO exports) use for hierarchy work: ``[Term]`` stanzas, ``id``,
``name``, ``is_a`` (with optional ``! comment``), ``is_obsolete``,
``alt_id``.  Other tags are preserved raw but not interpreted.
"""

from __future__ import annotations

from collections import defaultdict, deque
from dataclasses import dataclass, field


def _strip_comment(value: str) -> str:
    """Drop a trailing ``! comment`` (first unescaped ``!``), per OBO 1.2.
    Escape PAIRS are consumed atomically, so a value ending in an escaped
    backslash (``foo\\\\``) does not accidentally escape a following real
    comment; only ``\\!`` is unescaped (other OBO escapes pass through)."""
    out = []
    i = 0
    while i < len(value):
        ch = value[i]
        if ch == "\\" and i + 1 < len(value):
            out.append(value[i : i + 2])
            i += 2
            continue
        if ch == "!":
            break
        out.append(ch)
        i += 1
    return "".join(out).strip().replace("\\!", "!")


@dataclass
class OboTerm:
    id: str
    name: str | None = None
    parents: list[str] = field(default_factory=list)  # is_a targets
    alt_ids: list[str] = field(default_factory=list)
    obsolete: bool = False


class OboOntology:
    """Parsed ontology with the traversals the pipelines need."""

    def __init__(self, terms: dict[str, OboTerm]):
        self.terms = terms
        self._children: dict[str, list[str]] = defaultdict(list)
        for t in terms.values():
            for p in t.parents:
                self._children[p].append(t.id)

    @classmethod
    def from_text(cls, text: str) -> OboOntology:
        terms: dict[str, OboTerm] = {}
        cur: OboTerm | None = None
        in_term = False
        for raw in text.splitlines():
            line = raw.strip()
            if line.startswith("["):
                if cur is not None and cur.id:
                    terms[cur.id] = cur
                in_term = line == "[Term]"
                cur = OboTerm(id="") if in_term else None
                continue
            if not in_term or cur is None or not line or ":" not in line:
                continue
            tag, _, value = line.partition(":")
            # OBO allows a trailing '! comment' on ANY tag-value line —
            # strip it uniformly (first unescaped '!'), else a commented
            # id:/name: line corrupts the term id/label and the LUT join
            # silently misses
            value = _strip_comment(value.strip())
            if tag == "id":
                cur.id = value
            elif tag == "name":
                cur.name = value
            elif tag == "is_a":
                # 'MP:0000275 ! cardiac hypertrophy' → target id only
                cur.parents.append(value)
            elif tag == "alt_id":
                cur.alt_ids.append(value)
            elif tag == "is_obsolete":
                cur.obsolete = value.lower().startswith("true")
        if cur is not None and cur.id:
            terms[cur.id] = cur
        return cls(terms)

    @classmethod
    def from_file(cls, path: str) -> OboOntology:
        with open(path, encoding="utf-8") as f:
            return cls.from_text(f.read())

    def subclasses(self, term_id: str, distance: int | None = None) -> set[str]:
        """Descendant ids of ``term_id`` INCLUDING itself (pronto parity:
        ``Term.subclasses()`` yields the term first); ``distance`` bounds
        the hop count (1 → self + direct children)."""
        out, frontier = {term_id}, deque([(term_id, 0)])
        while frontier:
            node, d = frontier.popleft()
            if distance is not None and d >= distance:
                continue
            for c in self._children.get(node, ()):
                if c not in out:
                    out.add(c)
                    frontier.append((c, d + 1))
        return out

    def high_level_classes(self, root: str) -> set[str]:
        """Direct children of ``root`` — the reference's 'high-level class'
        notion: ``subclasses(distance=1) - {root}`` (IMPC.py:309)."""
        return self.subclasses(root, distance=1) - {root}

    def class_map_rows(self, root: str) -> list[tuple[str, str, str | None]]:
        """(term_id, class_id, class_name) for every term under each
        high-level class — the exact row shape the reference feeds to
        ``createDataFrame`` (IMPC.py:310-317).  A term under two classes
        yields two rows, as there."""
        rows = []
        for cls_id in sorted(self.high_level_classes(root)):
            cls_name = self.terms[cls_id].name if cls_id in self.terms else None
            for term_id in sorted(self.subclasses(cls_id)):
                rows.append((term_id, cls_id, cls_name))
        return rows


def phenotype_class_map(spark, obo: OboOntology | str, root: str):
    """Ontology → Spark lookup (modelPhenotypeId, modelPhenotypeClassId,
    modelPhenotypeClassLabel), entering the cluster via the S14 in-memory
    boundary — broadcastable dimension data, parity IMPC.py:307-317."""
    from evidence_datasource_parsers_spark.sources.readers import from_rows

    if isinstance(obo, str):
        obo = OboOntology.from_file(obo)
    return from_rows(
        spark,
        obo.class_map_rows(root),
        schema="modelPhenotypeId string, modelPhenotypeClassId string, "
        "modelPhenotypeClassLabel string",
    )
