"""Archive member scans (S4-S6): zip/tar payloads -> exploded member rows.

Reference behavior being re-expressed:
- ``unzip_xml_files`` (reference/hepcrawl/utils.py:44-54): extract ``*.xml``
  members of a World Scientific zip package.
- ``untar_files`` (reference/hepcrawl/spiders/edp_spider.py:205-219):
  extract ``*.xml`` from tar.gz / tar.bz2, optional path flattening.
- ``untar_files`` (reference/hepcrawl/spiders/iop_spider.py:132-147):
  extract ``*.pdf`` from tar.gz, always flattening to the basename.

The reference writes members to local disk and re-reads them; here the
archive is an opaque ``binary`` COLUMN and members become ROWS:

    archives (key cols..., payload binary)
        --mapInPandas decode-->  (key cols..., member_name, member_bytes)

Scale shape: the decode is narrow (no shuffle) and the suffix filter runs
INSIDE the decoder, so unwanted members are never materialized into Arrow
batches — at 100 TB of packed corpora only the requested member bytes ever
leave the scan task. ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds per-batch memory; media-sized members should also lower it.

``pack_zip_by_group`` / ``pack_tar_by_group`` are the inverse (deterministic
archive synthesis) so the member-scan queries are oracle-checkable: the
DuckDB twin predicts member names and content digests straight from the
source table, and the Spark side must reproduce them through a real
compress -> binary column -> decompress round trip.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
)


def _iter_zip_members(blob: bytes, suffix: str | None):
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        for name in z.namelist():
            if name.endswith("/"):
                continue
            if suffix is None or name.endswith(suffix):
                yield name, z.read(name)


def _iter_tar_members(blob: bytes, suffix: str | None):
    # mode "r:*" auto-detects gz/bz2/xz/plain — covers the reference's
    # tar.gz (iop) and tar.bz2 (edp rich) packages
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tar:
        for m in tar.getmembers():
            if not m.isfile():
                continue
            if suffix is None or m.path.endswith(suffix):
                f = tar.extractfile(m)
                yield m.path, f.read() if f is not None else b""


def explode_archive_members(
    archives: DataFrame,
    payload_col: str = "payload",
    fmt: str = "zip",
    suffix: str | None = None,
    flatten: bool = False,
) -> DataFrame:
    """One archive row -> N member rows (S4 zip / S5-S6 tar).

    Carries every non-payload column through; appends ``member_name`` and
    ``member_bytes``. ``suffix`` filters inside the decoder (e.g. ".xml",
    ".pdf"); ``flatten`` reduces member paths to their basename (the IOP
    pdf behavior, iop_spider.py:141)."""
    if fmt not in ("zip", "tar"):
        raise ValueError(f"fmt must be 'zip' or 'tar', got {fmt!r}")
    iter_members = _iter_zip_members if fmt == "zip" else _iter_tar_members
    keep = [f for f in archives.schema.fields if f.name != payload_col]
    keep_names = [f.name for f in keep]
    out_schema = StructType(
        keep
        + [
            StructField("member_name", StringType()),
            StructField("member_bytes", BinaryType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                blob = pdf[payload_col].iloc[i]
                base = tuple(pdf[c].iloc[i] for c in keep_names)
                for name, data in iter_members(bytes(blob), suffix):
                    if flatten:
                        name = name.rsplit("/", 1)[-1]
                    rows.append(base + (name, data))
            yield pd.DataFrame(rows, columns=keep_names + ["member_name", "member_bytes"])

    return archives.mapInPandas(decode, out_schema)


def pack_zip_by_group(
    grouped: DataFrame,
    group_col: str,
    name_col: str,
    content_col: str,
) -> DataFrame:
    """Deterministic zip synthesis: one archive row per group, one member
    per input row (name from ``name_col``, bytes = utf-8 of ``content_col``).
    Member order and timestamps are pinned so archives are reproducible."""
    return _pack_by_group(grouped, group_col, name_col, content_col, fmt="zip")


def pack_tar_by_group(
    grouped: DataFrame,
    group_col: str,
    name_col: str,
    content_col: str,
) -> DataFrame:
    """Deterministic tar.gz synthesis (see pack_zip_by_group)."""
    return _pack_by_group(grouped, group_col, name_col, content_col, fmt="tar")


def _pack_by_group(
    grouped: DataFrame, group_col: str, name_col: str, content_col: str, fmt: str
) -> DataFrame:
    gtype = grouped.schema[group_col].dataType.simpleString()
    out_schema = f"{group_col} {gtype}, payload binary"

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(name_col)
        buf = io.BytesIO()
        if fmt == "zip":
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
                for name, content in zip(pdf[name_col], pdf[content_col]):
                    zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                    zi.compress_type = zipfile.ZIP_DEFLATED
                    z.writestr(zi, content.encode("utf-8"))
        else:
            # mtime=0 on the members AND on the gzip stream header —
            # "w:gz" alone stamps the gzip header with wall-clock time,
            # which silently breaks byte-determinism across runs
            import gzip

            with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=6, mtime=0) as gz:
                with tarfile.open(fileobj=gz, mode="w") as tar:
                    for name, content in zip(pdf[name_col], pdf[content_col]):
                        data = content.encode("utf-8")
                        ti = tarfile.TarInfo(name)
                        ti.size = len(data)
                        ti.mtime = 0
                        tar.addfile(ti, io.BytesIO(data))
        return pd.DataFrame({group_col: [key[0]], "payload": [buf.getvalue()]})

    return grouped.groupBy(group_col).applyInPandas(build, out_schema)
