"""Record-file back-join (J4): patch ``documents[].url`` from fetched files.

Reference semantics (reference/hepcrawl/tohep.py:38-67,
``_get_updated_documents``): a record carries a ``documents`` list whose
urls point at the publisher; after the download pipeline runs, each
document whose basename matches a fetched record file is repointed at the
local/archive path:

    lookup = doc.old_url or doc.url or ''
    if lookup and basename(lookup) in {basename(f.name): f.path}:
        doc.old_url, doc.url = doc.url, index[basename]
        doc.key = doc.key or basename
    elif lookup:
        doc.url = doc.old_url          # restore the pre-pipeline url

Spark shape: posexplode the documents array (order preserved through the
position), equi-join on (record_id, basename) — never a cross join — then
re-assemble with array_sort(collect_list(struct(pos, doc))). The join key
includes the record id, so at 100 TB this shuffles records and their files
by the same key once; with both tables bucketed by record_id it becomes a
storage-partitioned join.

The reference builds the basename index as a dict, so a duplicate basename
keeps the LAST entry; distributed order is not meaningful, so we pin
"last" = max(path) and document it here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _basename(c: Column) -> Column:
    return F.element_at(F.split(c, "/"), -1)


def patch_document_urls(
    records: DataFrame,
    record_files: DataFrame,
    id_col: str = "record_id",
    docs_col: str = "documents",
    name_col: str = "name",
    path_col: str = "path",
) -> DataFrame:
    """J4: return ``records`` with ``documents[].url`` repointed at fetched
    record files (struct fields url/old_url/key are rewritten; any other
    struct fields pass through unchanged is NOT supported — the reference
    record shape has exactly these three url-ish fields)."""
    docs = records.select(
        F.col(id_col).alias("_rid"), F.posexplode_outer(docs_col).alias("_pos", "_d")
    ).filter(
        # posexplode_outer emits one (null pos, null doc) row for an empty or
        # null documents array; without this filter that row survives
        # collect_list as a struct-of-nulls junk document (round-2 ADVICE).
        # Filtered records fall out of `patched` and are coalesced back to
        # their original documents value after the re-join below.
        F.col("_pos").isNotNull()
    )
    lookup = F.coalesce(F.col("_d.old_url"), F.col("_d.url"), F.lit(""))
    docs = docs.withColumn("_base", _basename(lookup)).withColumn("_lookup", lookup)

    rf = (
        record_files.select(
            F.col(id_col).alias("_f_rid"),
            _basename(F.col(name_col)).alias("_f_base"),
            F.col(path_col).alias("_f_path"),
        )
        # dict-index semantics: one path per basename (last wins -> max)
        .groupBy("_f_rid", "_f_base")
        .agg(F.max("_f_path").alias("_f_path"))
    )

    j = docs.join(
        rf,
        (F.col("_rid") == F.col("_f_rid"))
        & (F.col("_base") == F.col("_f_base"))
        & (F.col("_lookup") != ""),
        "left",
    )
    matched = F.col("_f_path").isNotNull()
    new_doc = F.struct(
        # unmatched truthy lookup restores the pre-pipeline url (old_url),
        # but a doc that only ever had `url` must KEEP it — the reference
        # raises KeyError on document['old_url'] there rather than nulling
        # the only url (round-2 ADVICE: loud-or-keep, never silently None).
        F.when(matched, F.col("_f_path"))
        .when(
            F.col("_lookup") != "",
            F.coalesce(F.col("_d.old_url"), F.col("_d.url")),
        )
        .otherwise(F.col("_d.url"))
        .alias("url"),
        F.when(matched, F.col("_d.url")).otherwise(F.col("_d.old_url")).alias(
            "old_url"
        ),
        F.when(matched, F.coalesce(F.col("_d.key"), F.col("_base")))
        .otherwise(F.col("_d.key"))
        .alias("key"),
    )
    patched = (
        j.select(F.col("_rid"), F.col("_pos"), new_doc.alias("_nd"))
        .groupBy("_rid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_nd"))),
                lambda x: x["_nd"],
            ).alias(docs_col)
        )
    )
    orig = f"_orig_{docs_col}"
    return (
        records.withColumnRenamed(docs_col, orig)
        .join(patched, records[id_col] == patched["_rid"], "left")
        # records whose documents array was empty/null produced no exploded
        # rows: restore the original value unchanged (reference
        # _get_updated_documents returns [] for [])
        .withColumn(docs_col, F.coalesce(F.col(docs_col), F.col(orig)))
        .drop("_rid", orig)
    )
