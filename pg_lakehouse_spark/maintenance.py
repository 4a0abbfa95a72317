"""Catalog-wide maintenance sweep.

The reference declares an auto-compaction threshold GUC (64 files,
handler.c:64-65,337-347) and a vacuum callback (iceberg_am.c:274-287)
that never act. This module is the acting version: one sweep entry
point a scheduler calls per catalog — threshold-compact + expire +
orphan-clean every table, reporting what it did.

At scale this is the nightly table-service job: each table's work is
independent (a real deployment fans tables out as separate Spark jobs);
the sweep itself touches only metadata plus the rewritten small files.
"""

from __future__ import annotations

from pg_lakehouse_spark.lakehouse import LakeCatalog


def run_maintenance(
    catalog: LakeCatalog,
    namespace: str | None = None,
    compaction_file_threshold: int = 64,
    small_file_bytes: int = 32 * 1024 * 1024,
    keep_snapshots: int = 3,
) -> list[dict]:
    """Sweep every table: compact when the file count crosses the
    threshold, then expire old snapshots and remove orphan files.
    Returns one report row per table."""
    reports = []
    for ns, name in catalog.list_tables(namespace):
        tbl = catalog.load_table(ns, name)
        before = tbl.table_info()
        compacted = tbl.maybe_compact(
            file_count_threshold=compaction_file_threshold,
            small_file_bytes=small_file_bytes,
        )
        vac = tbl.vacuum(keep_last=keep_snapshots)
        after = tbl.table_info()
        reports.append(
            {
                "namespace": ns,
                "table": name,
                "files_before": before["total_files"],
                "files_after": after["total_files"],
                "compacted": compacted is not None,
                "expired_snapshots": len(vac["expired_snapshots"]),
                "removed_orphans": len(vac["removed_files"]),
                "rows": after["total_rows"],
            }
        )
    return reports
