"""Schema drift detection — what changed between a source's current
schema and the destination's (or a previous load's).

The reference handles drift implicitly: reflected append (K3) silently
intersects columns, auto-create DDL (K7) freezes the first-seen schema.
This makes drift EXPLICIT so a sync job can decide (fail, evolve, or
intersect) instead of silently narrowing — the step between "schema
changed upstream" and "half the columns loaded as NULL"."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import StructType


@dataclass(frozen=True)
class SchemaChange:
    kind: str  # added | removed | type_changed | nullability_changed
    column: str
    before: str | None
    after: str | None


def schema_diff(old: StructType, new: StructType) -> list[SchemaChange]:
    """Column-level diff, case-insensitive on names (matching the K3
    reflected-append intersection semantics). Deterministic order:
    added, removed, then changed, each alphabetical."""
    o = {f.name.lower(): f for f in old.fields}
    n = {f.name.lower(): f for f in new.fields}
    changes: list[SchemaChange] = []
    for name in sorted(set(n) - set(o)):
        changes.append(SchemaChange("added", n[name].name, None, n[name].dataType.simpleString()))
    for name in sorted(set(o) - set(n)):
        changes.append(SchemaChange("removed", o[name].name, o[name].dataType.simpleString(), None))
    for name in sorted(set(o) & set(n)):
        fo, fn = o[name], n[name]
        if fo.dataType != fn.dataType:
            changes.append(
                SchemaChange(
                    "type_changed", fn.name,
                    fo.dataType.simpleString(), fn.dataType.simpleString(),
                )
            )
        elif fo.nullable != fn.nullable:
            changes.append(
                SchemaChange(
                    "nullability_changed", fn.name,
                    str(fo.nullable).lower(), str(fn.nullable).lower(),
                )
            )
    return changes


def assert_no_breaking_drift(old: StructType, new: StructType) -> list[SchemaChange]:
    """Raise on changes that would corrupt an append (removed columns,
    type changes); return the benign ones (additions, nullability).
    The caller decides what to do with additions (evolve vs ignore)."""
    changes = schema_diff(old, new)
    breaking = [c for c in changes if c.kind in ("removed", "type_changed")]
    if breaking:
        detail = "; ".join(f"{c.kind}:{c.column} {c.before}->{c.after}" for c in breaking)
        raise ValueError(f"breaking schema drift: {detail}")
    return changes
