"""Spec evolution diff: compare two versions of a TableSpec and
classify every change as breaking or compatible.

The reference carries a ``version`` field on every schema document
(``schema/models.py:127``) but has no tooling around it; at data scale
a spec change is a *deployment event* — tightening a constraint can
turn a green 10^12-row table red on the next run, and a type change
breaks downstream readers. This module gives the pre-deployment
answer: what changed, and can existing conforming data fail under the
new spec?

Classification rule (data-centric): a change is **breaking** iff some
row that conforms to the OLD spec can violate the NEW one —
tightening. Loosening (and pure metadata) is compatible.

Output records mirror the validation error triple
(type, error_at, message) plus ``breaking`` — the same shape the rest
of the engine prints and tests against.
"""

from __future__ import annotations

from typing import Any, Optional

from py_schemax_spark.specs.model import ColumnSpec, TableSpec

# (attribute, direction) → tightened predicate. ``None`` always counts
# as the loosest value for bounds-like attributes.


def _tightened(attr: str, old: Any, new: Any) -> Optional[bool]:
    """True = tightened (breaking), False = loosened/compatible,
    None = not comparable this way (handled elsewhere)."""
    if old == new:
        return None
    # None = unconstrained: adding a constraint tightens, dropping
    # one loosens
    if old is None:
        return True
    if new is None:
        return False
    if attr in ("min_length", "minimum"):
        return new > old
    if attr in ("max_length", "maximum", "precision"):
        return new < old
    # pattern / format / timezone / references: any change can fail
    # previously-conforming values — treat as tightened
    return True


_BOUND_ATTRS = (
    "min_length", "max_length", "pattern", "minimum", "maximum",
    "precision", "format", "timezone",
)


def _col_changes(old: ColumnSpec, new: ColumnSpec) -> list[dict]:
    at = f"$.{old.name}"
    out: list[dict] = []
    if old.type != new.type:
        out.append(
            {
                "type": "type_changed",
                "error_at": f"{at}.type",
                "message": f"type {old.type} -> {new.type}",
                "breaking": True,
            }
        )
    if old.nullable and not new.nullable:
        out.append(
            {
                "type": "constraint_tightened",
                "error_at": f"{at}.nullable",
                "message": "nullable true -> false: existing null rows fail",
                "breaking": True,
            }
        )
    elif not old.nullable and new.nullable:
        out.append(
            {
                "type": "constraint_loosened",
                "error_at": f"{at}.nullable",
                "message": "nullable false -> true",
                "breaking": False,
            }
        )
    for flag in ("unique", "primary_key"):
        if not getattr(old, flag) and getattr(new, flag):
            out.append(
                {
                    "type": "constraint_tightened",
                    "error_at": f"{at}.{flag}",
                    "message": f"{flag} enabled: existing duplicates fail",
                    "breaking": True,
                }
            )
        elif getattr(old, flag) and not getattr(new, flag):
            out.append(
                {
                    "type": "constraint_loosened",
                    "error_at": f"{at}.{flag}",
                    "message": f"{flag} disabled",
                    "breaking": False,
                }
            )
    for attr in _BOUND_ATTRS:
        t = _tightened(attr, getattr(old, attr), getattr(new, attr))
        if t is None:
            continue
        out.append(
            {
                "type": "constraint_tightened" if t else "constraint_loosened",
                "error_at": f"{at}.{attr}",
                "message": (
                    f"{attr}: {getattr(old, attr)!r} -> {getattr(new, attr)!r}"
                ),
                "breaking": t,
            }
        )
    if old.references != new.references:
        tightened = new.references is not None
        out.append(
            {
                "type": (
                    "constraint_tightened" if tightened
                    else "constraint_loosened"
                ),
                "error_at": f"{at}.references",
                "message": f"references {old.references} -> {new.references}",
                "breaking": tightened,
            }
        )
    if old.drift != new.drift:
        # drift compares distributions vs a baseline, not rows — a
        # changed threshold can fail the RUN but no individual row
        out.append(
            {
                "type": "check_changed",
                "error_at": f"{at}.drift",
                "message": f"drift {old.drift} -> {new.drift}",
                "breaking": new.drift is not None,
            }
        )
    return out


def spec_diff(old: TableSpec, new: TableSpec) -> list[dict]:
    """All changes from ``old`` to ``new``, most useful first (breaking
    before compatible, stable within each class by column order)."""
    changes: list[dict] = []
    old_cols = {c.name: c for c in old.columns}
    new_cols = {c.name: c for c in new.columns}
    for name, c in new_cols.items():
        if name not in old_cols:
            # a new required column: existing rows don't have it →
            # every row fails schema conformance. A nullable addition
            # is compatible (missing column values read as null).
            breaking = not c.nullable
            changes.append(
                {
                    "type": "column_added",
                    "error_at": f"$.{name}",
                    "message": (
                        f"column '{name}' added"
                        + (" (non-nullable: existing rows fail)"
                           if breaking else " (nullable)")
                    ),
                    "breaking": breaking,
                }
            )
    for name in old_cols:
        if name not in new_cols:
            changes.append(
                {
                    "type": "column_removed",
                    "error_at": f"$.{name}",
                    "message": (
                        f"column '{name}' removed: stored data becomes "
                        "extra_forbidden under the new spec"
                    ),
                    "breaking": True,
                }
            )
    for name, oc in old_cols.items():
        nc = new_cols.get(name)
        if nc is not None:
            changes.extend(_col_changes(oc, nc))
    if old.extraction != new.extraction:
        # adding (or retargeting) the per-row byte-identical extraction
        # invariant can fail rows that conformed before; dropping it
        # only loosens
        tightened = new.extraction is not None
        changes.append(
            {
                "type": (
                    "constraint_tightened" if tightened
                    else "constraint_loosened"
                ),
                "error_at": "$.extraction",
                "message": f"extraction {old.extraction} -> {new.extraction}",
                "breaking": tightened,
            }
        )
    if old.key != new.key:
        changes.append(
            {
                "type": "check_changed",
                "error_at": "$.key",
                "message": (
                    f"violation attribution key {old.key!r} -> {new.key!r} "
                    "(changes violation-row identity, not row validity)"
                ),
                "breaking": False,
            }
        )
    changes.sort(key=lambda ch: (not ch["breaking"],))
    return changes
