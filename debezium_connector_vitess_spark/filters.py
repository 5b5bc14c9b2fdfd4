"""Row/column filters — SURVEY.md §2.3 F1-F6.

All pure Catalyst expressions: Spark pushes them into the scan (predicate
pushdown / column pruning are free), and the streaming source applies the
table include list server-side as VStream rules (F2 — see sources/).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .types import SYSTEM_SCHEMAS

# Reference: Filters.java:20-58 — system schemas always excluded.
_SYSTEM_SCHEMA_PRED = ", ".join(f"'{s}'" for s in sorted(SYSTEM_SCHEMAS))


def _fullmatch(pattern: str) -> str:
    """Debezium regex lists are anchored full matches."""
    return f"^(?:{pattern})$"


@dataclass
class TableFilter:
    """table.include.list / table.exclude.list semantics against
    ``keyspace.table`` (shard stripped — VitessTableIdToStringMapper.java:13-26;
    Filters.java:20-58). Include wins over exclude when both set (Debezium
    validates them as mutually exclusive; we mirror)."""

    include_list: Optional[list[str]] = None
    exclude_list: Optional[list[str]] = None

    def predicate(self, keyspace: Column, table: Column) -> Column:
        qualified = F.concat(keyspace, F.lit("."), table)
        pred = ~keyspace.isin(*sorted(SYSTEM_SCHEMAS))
        if self.include_list:
            inc = None
            for p in self.include_list:
                c = qualified.rlike(_fullmatch(p))
                inc = c if inc is None else (inc | c)
            pred = pred & inc
        elif self.exclude_list:
            for p in self.exclude_list:
                pred = pred & ~qualified.rlike(_fullmatch(p))
        return pred

    def apply(self, df: DataFrame, keyspace: str = "keyspace", table: str = "table_name") -> DataFrame:
        """F1 + F6: drop filtered tables before decode (short-circuit)."""
        return df.filter(self.predicate(F.col(keyspace), F.col(table)))

    def matches(self, keyspace: str, table: str) -> bool:
        """Driver-side check (used to build server-side VStream rules — F2)."""
        if keyspace in SYSTEM_SCHEMAS:
            return False
        q = f"{keyspace}.{table}"
        if self.include_list:
            return any(re.fullmatch(p, q) for p in self.include_list)
        if self.exclude_list:
            return not any(re.fullmatch(p, q) for p in self.exclude_list)
        return True


@dataclass
class SnapshotTableFilter:
    """F3: ``snapshot.mode.tables`` — regex include list selecting which tables
    the initial copy phase snapshots (Filters.java:39-48). Semantics differ
    from TableFilter: when the list is EMPTY, *no* table is copied (the
    reference builds ``fromPredicate(tableId -> false)``), whereas an empty
    table.include.list means "all tables". Patterns are anchored full matches
    against ``keyspace.table`` (VitessTableIdToStringMapper.java:13-26)."""

    mode_tables: Optional[list[str]] = None

    def matches(self, keyspace: str, table: str) -> bool:
        if not self.mode_tables:
            return False
        q = f"{keyspace}.{table}"
        return any(re.fullmatch(p, q) for p in self.mode_tables)

    def tables_to_copy(self, keyspace: str, all_tables: list[str]) -> list[str]:
        """Driver-side: the ``tables_to_copy`` VStreamFlags list
        (VitessReplicationConnection.java:308-312,
        VitessConnector.getTablesToCopyByPrefix:278-292)."""
        return [t for t in all_tables if self.matches(keyspace, t)]

    def predicate(self, keyspace: Column, table: Column) -> Column:
        """Catalyst form for filtering a multi-table backfill frame."""
        if not self.mode_tables:
            return F.lit(False)
        qualified = F.concat(keyspace, F.lit("."), table)
        pred = None
        for p in self.mode_tables:
            c = qualified.rlike(_fullmatch(p))
            pred = c if pred is None else (pred | c)
        return pred


@dataclass
class ColumnFilter:
    """Column include/exclude + truncate + mask (F4).

    Reference: inherited relational column filters, exercised at
    VitessConnectorIT.java:742-897. Spark-native: drop()/substring()/sha2()
    column ops on the decoded image structs or flat frames.
    """

    exclude: list[str] = field(default_factory=list)
    include: list[str] = field(default_factory=list)
    truncate: dict[str, int] = field(default_factory=dict)  # column -> max length
    mask_hash: list[str] = field(default_factory=list)  # columns -> sha256 hex
    mask_const: dict[str, str] = field(default_factory=dict)  # column -> constant

    def apply_flat(self, df: DataFrame) -> DataFrame:
        """Apply to a flat DataFrame (one column per source column)."""
        if self.include:
            keep = [c for c in df.columns if c in self.include]
            df = df.select(*keep)
        for c in self.exclude:
            if c in df.columns:
                df = df.drop(c)
        for c, n in self.truncate.items():
            if c in df.columns:
                df = df.withColumn(c, F.substring(F.col(c), 1, n))
        for c in self.mask_hash:
            if c in df.columns:
                df = df.withColumn(c, F.sha2(F.col(c).cast("string"), 256))
        for c, v in self.mask_const.items():
            if c in df.columns:
                df = df.withColumn(c, F.lit(v))
        return df

    def apply_images(self, df: DataFrame, images: tuple[str, ...] = ("before", "after")) -> DataFrame:
        """Apply inside the envelope's before/after structs via withField/dropFields."""
        for img in images:
            col = F.col(img)
            for c in self.exclude:
                col = col.dropFields(c)
            for c, n in self.truncate.items():
                col = col.withField(c, F.substring(col.getField(c), 1, n))
            for c in self.mask_hash:
                col = col.withField(c, F.sha2(col.getField(c).cast("string"), 256))
            for c, v in self.mask_const.items():
                col = col.withField(c, F.lit(v))
            df = df.withColumn(img, F.when(F.col(img).isNotNull(), col))
        return df


def prune_empty_shards(shards_with_tablets: dict[str, bool]) -> list[str]:
    """F5: ``vitess.exclude.empty.shards`` — keep only serving shards
    (control-plane analog of SHOW VITESS_TABLETS pruning,
    VitessMetadata.java:127-134,200-215). Partition-pruning analog: fewer
    source input partitions."""
    return sorted(s for s, serving in shards_with_tablets.items() if serving)
