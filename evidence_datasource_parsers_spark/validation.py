"""JSON-Schema output validation (SURVEY §2.17 M2), dependency-free.

The reference validates every emitted evidence file against a versioned
JSON Schema (``Snakefile:110,131,155`` runs ``opentargets_validator`` per
rule; the schema root is pinned in ``configuration.yaml:4``).  This module
re-expresses that contract Spark-first: a pure-Python validator compiled
from a schema dict runs INSIDE an Arrow-batched ``mapInPandas`` stage over
the output rows, so validation distributes with the data instead of
re-reading emitted files on the driver — at 100 TB the driver never sees a
row, only the violation count and a bounded sample.

Supported subset (the constructs the reference's schemas actually use):
``type`` (incl. union lists), ``required``, ``properties``,
``additionalProperties`` (boolean form), ``enum``, ``const``, ``pattern``,
``minLength``/``maxLength``, ``minimum``/``maximum`` (+ exclusive forms),
``items`` (single-schema form), ``minItems``/``maxItems``, ``uniqueItems``,
``anyOf``/``allOf``/``oneOf``, and arbitrary nesting.  Unknown keywords are
ignored, as the spec requires; unknown ``type`` NAMES are rejected at
compile time.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TYPE_CHECKS = {
    "string": lambda v: isinstance(v, str),
    # JSON Schema: 1.0 IS an integer (zero fractional part) — Spark double
    # columns holding integral values must pass an {"type": "integer"} gate
    "integer": lambda v: (isinstance(v, int) and not isinstance(v, bool))
    or (isinstance(v, float) and v.is_integer()),
    "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "boolean": lambda v: isinstance(v, bool),
    "object": lambda v: isinstance(v, dict),
    "array": lambda v: isinstance(v, list),
    "null": lambda v: v is None,
}


def _assert_known_types(schema, path: str = "$") -> None:
    """Reject unsupported ``type`` names at COMPILE time, on the driver —
    a typo like {"type": "date"} must fail with a clear message before any
    job starts, not as a KeyError inside an executor kernel."""
    if isinstance(schema, dict):
        t = schema.get("type")
        for name in t if isinstance(t, list) else ([t] if t else []):
            if name not in _TYPE_CHECKS:
                raise ValueError(
                    f"unsupported JSON-Schema type {name!r} at {path} "
                    f"(supported: {sorted(_TYPE_CHECKS)})"
                )
        for key in ("properties",):
            for k, sub in schema.get(key, {}).items():
                _assert_known_types(sub, f"{path}.{k}")
        for key in ("items",):
            if isinstance(schema.get(key), dict):
                _assert_known_types(schema[key], f"{path}[]")
        for key in ("anyOf", "allOf", "oneOf"):
            for i, sub in enumerate(schema.get(key, ())):
                _assert_known_types(sub, f"{path}<{key}[{i}]>")


def _check(value, schema: dict, path: str, errors: list[str]) -> None:
    t = schema.get("type")
    if t is not None:
        types = t if isinstance(t, list) else [t]
        if not any(_TYPE_CHECKS[x](value) for x in types):
            errors.append(f"{path}: expected type {t}, got {type(value).__name__}")
            return  # downstream keyword checks assume the right type
    if "enum" in schema and value not in schema["enum"]:
        errors.append(f"{path}: {value!r} not in enum {schema['enum']}")
    if "const" in schema and value != schema["const"]:
        errors.append(f"{path}: {value!r} != const {schema['const']!r}")
    if "anyOf" in schema:
        branches = []
        for sub in schema["anyOf"]:
            sub_errors: list[str] = []
            _check(value, sub, path, sub_errors)
            if not sub_errors:
                break
            branches.append(sub_errors[0])
        else:
            errors.append(f"{path}: no anyOf branch matched ({'; '.join(branches)})")
    if "allOf" in schema:
        for i, sub in enumerate(schema["allOf"]):
            _check(value, sub, f"{path}<allOf[{i}]>", errors)
    if "oneOf" in schema:
        matched = []
        for i, sub in enumerate(schema["oneOf"]):
            sub_errors = []
            _check(value, sub, path, sub_errors)
            if not sub_errors:
                matched.append(i)
        if len(matched) != 1:
            errors.append(
                f"{path}: oneOf matched {len(matched)} branches "
                f"({matched}), need exactly 1"
            )
    if isinstance(value, str):
        if "pattern" in schema and not re.search(schema["pattern"], value):
            errors.append(f"{path}: {value!r} !~ /{schema['pattern']}/")
        if "minLength" in schema and len(value) < schema["minLength"]:
            errors.append(f"{path}: length {len(value)} < minLength")
        if "maxLength" in schema and len(value) > schema["maxLength"]:
            errors.append(f"{path}: length {len(value)} > maxLength")
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if "minimum" in schema and value < schema["minimum"]:
            errors.append(f"{path}: {value} < minimum {schema['minimum']}")
        if "maximum" in schema and value > schema["maximum"]:
            errors.append(f"{path}: {value} > maximum {schema['maximum']}")
        if "exclusiveMinimum" in schema and value <= schema["exclusiveMinimum"]:
            errors.append(f"{path}: {value} <= exclusiveMinimum")
        if "exclusiveMaximum" in schema and value >= schema["exclusiveMaximum"]:
            errors.append(f"{path}: {value} >= exclusiveMaximum")
    if isinstance(value, dict):
        for req in schema.get("required", ()):
            if req not in value:
                errors.append(f"{path}: missing required property {req!r}")
        props = schema.get("properties", {})
        for k, sub in props.items():
            if k in value:
                _check(value[k], sub, f"{path}.{k}", errors)
        if schema.get("additionalProperties") is False:
            extra = set(value) - set(props)
            if extra:
                errors.append(f"{path}: unexpected properties {sorted(extra)}")
    if isinstance(value, list):
        if "minItems" in schema and len(value) < schema["minItems"]:
            errors.append(f"{path}: {len(value)} items < minItems")
        if "maxItems" in schema and len(value) > schema["maxItems"]:
            errors.append(f"{path}: {len(value)} items > maxItems")
        if schema.get("uniqueItems"):
            seen = []
            for x in value:
                if x in seen:
                    errors.append(f"{path}: duplicate item {x!r}")
                    break
                seen.append(x)
        items = schema.get("items")
        if isinstance(items, dict):
            for i, x in enumerate(value):
                _check(x, items, f"{path}[{i}]", errors)


def compile_validator(schema: dict) -> Callable[[object], list[str]]:
    """Schema dict → ``value -> [errors]`` function (empty list = valid).
    Unsupported ``type`` names raise here, driver-side."""
    _assert_known_types(schema)

    def validate(value) -> list[str]:
        errors: list[str] = []
        _check(value, schema, "$", errors)
        return errors

    return validate


def validate_json_schema(df: DataFrame, schema: dict) -> DataFrame:
    """Distributed validation: every row (as a JSON object) checked against
    ``schema`` inside one Arrow-batched pass.

    NULL SEMANTICS — rows are serialized with ``to_json``, which DROPS
    null fields (Spark has no ``ignoreNullFields=false`` for struct
    serialization pre-4.0 semantics here, and the emitted-file
    representation the reference validates also omits nulls).  Two
    consequences schema authors must know:

      * a present-but-NULL column counts as ABSENT → it fails ``required``;
      * a ``{"type": ["string", "null"]}`` branch can never observe a JSON
        null — express nullability by omitting the field from ``required``
        instead.

    This matches validating the written JSONL output byte-for-byte, which
    is the contract that matters for downstream consumers.

    Returns a DataFrame of violations ``(error string)`` — empty when the
    output conforms.  No driver-side row loop: callers aggregate or sample
    it with normal Spark actions."""
    import json

    compile_validator(schema)  # driver-side schema sanity before any job
    jdf = df.select(F.to_json(F.struct(*df.columns)).alias("__json"))

    def kernel(batches):
        import pandas as pd

        validate = compile_validator(schema)
        for pdf in batches:
            out = []
            for j in pdf["__json"]:
                for e in validate(json.loads(j)):
                    out.append(e)
            yield pd.DataFrame({"error": pd.array(out, dtype="str")})

    return jdf.mapInPandas(kernel, "error string")


def assert_json_schema(df: DataFrame, schema: dict, sample: int = 10) -> None:
    """Raise ``SchemaContractError`` with a bounded violation sample if any
    row breaks the schema — ONE Spark action (take of the violations)."""
    from evidence_datasource_parsers_spark.runner import SchemaContractError

    violations = validate_json_schema(df, schema).take(sample)
    if violations:
        msgs = "\n  ".join(r["error"] for r in violations)
        raise SchemaContractError(
            f"JSON-Schema validation failed (first {len(violations)}):\n  {msgs}"
        )
