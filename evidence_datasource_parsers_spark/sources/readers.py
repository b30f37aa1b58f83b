"""Source operators S1-S14 (SURVEY §2.1), Spark-first.

The reference's format-autodetect reader (``common/evidence.py:230-285``)
dispatches on extension and directory contents; this module re-expresses that
as a thin declarative wrapper over ``spark.read`` so every scan benefits from
predicate pushdown, column pruning and partition pruning.  Remote staging
(S9) and driver-parsed formats (Excel S10, XML S11, REST S12/S13) are isolated
behind small functions that land in a DataFrame as early as possible.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_CSV_EXTS = {".csv": ",", ".tsv": "\t", ".tab": "\t", ".txt": "\t"}


def _strip_compression(path: str) -> str:
    for ext in (".gz", ".bz2", ".zst", ".bgz"):
        if path.endswith(ext):
            return path[: -len(ext)]
    return path


def read_csv(
    spark: SparkSession,
    paths: str | list[str],
    sep: str = ",",
    header: bool = True,
    schema: StructType | str | None = None,
    infer_schema: bool = False,
    multiline: bool = False,
    null_value: str | None = None,
    quote: str = '"',
    skip_rows: int = 0,
) -> DataFrame:
    """CSV/TSV scan: S1 (options), S2 (forced schema), S3 (multi-file),
    S4 (inferSchema).

    ``skip_rows`` replaces the reference's fragile
    ``monotonically_increasing_id``-based preamble skipping
    (``modules/ClinGen.py:66-70``).  OSS Spark CSV has no skip option, so the
    preamble is stripped deterministically on the driver into a temp file —
    valid because preamble-bearing inputs are, by nature, small curated files
    that are already staged locally (see ``stage_remote``); large fact data
    never carries a preamble.
    """
    if skip_rows:
        if not isinstance(paths, str) or not os.path.isfile(paths):
            raise ValueError("skip_rows requires a single local file")
        import tempfile

        stripped = tempfile.NamedTemporaryFile(
            mode="w", suffix=".csv", delete=False
        )
        with open(paths) as src, stripped:
            for i, line in enumerate(src):
                if i >= skip_rows:
                    stripped.write(line)
        paths = stripped.name
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("quote", quote)
        .option("multiLine", multiline)
        .option("escape", '"')
    )
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    if isinstance(paths, str):
        paths = [paths]
    return reader.csv(list(paths))


def read_json(
    spark: SparkSession,
    paths: str | list[str],
    schema: StructType | str | None = None,
    recursive: bool = False,
    multiline: bool = False,
) -> DataFrame:
    """JSON / JSON-lines scan (S5) incl. recursive directory lookup (S6)."""
    reader = spark.read.option("multiLine", multiline)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if schema is not None:
        reader = reader.schema(schema)
    if isinstance(paths, str):
        paths = [paths]
    return reader.json(list(paths))


def read_parquet(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parquet scan (S7) — columnar, pushdown-friendly; the scale path."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.parquet(*paths)


def read_path(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **csv_opts,
) -> DataFrame:
    """Format-autodetect reader (S8) — extension dispatch, directory peeking.

    Capability parity with ``common/evidence.py:230-285``: a directory is
    classified by the extensions of its data files (mixed directories are an
    error); a file dispatches on its own extension, compression-suffix aware.
    """
    probe = path
    if os.path.isdir(path):
        entries = [
            e
            for e in os.listdir(path)
            if not e.startswith((".", "_")) and not e.endswith(".crc")
        ]
        if not entries:
            raise ValueError(f"empty directory: {path}")
        exts = {
            os.path.splitext(_strip_compression(e))[1].lower() for e in entries
        }
        if len(exts) != 1:
            raise ValueError(f"mixed-format directory {path}: {sorted(exts)}")
        probe = entries[0]
    ext = os.path.splitext(_strip_compression(probe))[1].lower()
    if ext in _CSV_EXTS:
        opts = {"sep": _CSV_EXTS[ext], **csv_opts}
        return read_csv(spark, path, schema=schema, **opts)
    if ext in (".json", ".jsonl", ".ndjson"):
        return read_json(spark, path, schema=schema, recursive=os.path.isdir(path))
    if ext in (".parquet", ".pq"):
        return read_parquet(spark, path)
    raise ValueError(f"unsupported extension {ext!r} for {path}")


def from_rows(
    spark: SparkSession,
    rows: Iterable,
    schema: StructType | str | list[str] | None = None,
) -> DataFrame:
    """In-memory table from Python objects (S14) — small LUTs only.

    At cluster scale this is for dimension/config data that will broadcast;
    fact data must arrive through a file/stream source.
    """
    return spark.createDataFrame(list(rows), schema=schema)


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """pandas → Spark boundary (S10 Excel tier); Arrow-accelerated."""
    return spark.createDataFrame(pdf)


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name=0,
    skiprows: int = 0,
    skipfooter: int = 0,
    header=0,
) -> DataFrame:
    """Excel scan (S10): pandas ``read_excel`` → Arrow → DataFrame.

    Mirrors ``modules/CvdiGeneBurden.py:100-106`` / ``chemicalProbes.py:123-129``.
    Gated: openpyxl is not guaranteed in the runtime image.
    """
    import pandas as pd

    try:
        pdf = pd.read_excel(
            path,
            sheet_name=sheet_name,
            skiprows=skiprows,
            skipfooter=skipfooter,
            header=header,
        )
    except ImportError as exc:  # pragma: no cover - engine missing
        raise NotImplementedError(
            "Excel support requires openpyxl/xlrd, not present in this image"
        ) from exc
    return from_pandas(spark, pdf)


def read_xml_elements(
    spark: SparkSession,
    path: str,
    record_tag: str,
    field_extractor,
    schema: StructType | str | None = None,
) -> DataFrame:
    """XML scan (S11): ElementTree walk → rows → DataFrame.

    Mirrors ``modules/Orphanet.py:52-126``.  ``field_extractor(elem) -> dict``
    maps one ``<record_tag>`` element to a flat row.  Driver-side by design:
    the reference's XML inputs are small curated dumps; large XML at cluster
    scale should be converted upstream or read with a distributed XML source.
    """
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    rows = [field_extractor(elem) for elem in root.iter(record_tag)]
    return spark.createDataFrame(rows, schema=schema)


def stage_remote(spark: SparkSession, url: str) -> str:
    """Remote file staging (S9): HTTP/FTP URL → local path via SparkFiles.

    Mirrors ``common/evidence.py:203-205``; on a real cluster prefer a direct
    ``spark.read`` against an object-store/HTTP-capable filesystem connector.
    """
    from pyspark import SparkFiles

    spark.sparkContext.addFile(url)
    return SparkFiles.get(url.split("/")[-1])
