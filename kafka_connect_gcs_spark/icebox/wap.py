"""Write–audit–publish (WAP) gating for the icebox table.

The ingest loop appends snapshots continuously; downstream consumers
often must not see a batch until it passes data-quality audits (the
Iceberg WAP workflow, `write.wap.enabled`). The icebox log already
separates "committed" from "what a reader chooses to read" (every read
can pin a version), so WAP here is a durable *published* ref:

* writers advance the snapshot log exactly as before — nothing changes
  on the ingest path;
* consumers read through :func:`read_published`, which resolves the ref;
* :func:`audit_and_publish` runs caller-supplied checks over the EXACT
  incremental changelog between the published version and the head
  (:mod:`.changes` — cost ∝ what the new commits touched, never table
  size) and fast-forwards the ref only if every check passes.

The ref is a single JSON file swapped by atomic rename — the same
commit primitive as the table's version hint — so a crash during
publish leaves either the old or the new ref, never a torn one.
Publishing is fast-forward-only: the ref can't move backwards, which
makes concurrent audit runs idempotent (both try to publish the same
head; the second is a no-op).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Callable, Sequence

from pyspark.sql import DataFrame

from kafka_connect_gcs_spark.icebox.changes import table_changes
from kafka_connect_gcs_spark.icebox.table import IceboxTable


class AuditFailed(Exception):
    """An audit check vetoed the publish; the ref was not moved."""


def _ref_path(table: IceboxTable) -> str:
    return os.path.join(table.meta_dir, "published-ref.json")


def published_version(table: IceboxTable) -> int:
    """The consumer-visible version (0 = nothing published yet: an empty
    table for readers, regardless of what the log already holds)."""
    p = _ref_path(table)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["version"])


def read_published(table: IceboxTable, **read_kwargs) -> DataFrame:
    """Read the table at the published ref (consumers' entry point)."""
    return table.read(published_version(table), **read_kwargs)


def publish(table: IceboxTable, version: int | None = None) -> int:
    """Fast-forward the published ref to ``version`` (default: head).
    Returns the ref after the call. Moving backwards raises — use a
    fresh ref file only via explicit operator action."""
    target = table.current_version() if version is None else int(version)
    cur = published_version(table)
    if target < cur:
        raise ValueError(
            f"publish cannot move the ref backwards ({cur} -> {target})"
        )
    if target == cur:
        return cur
    p = _ref_path(table)
    tmp = p + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"version": target}, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, p)
    return target


def audit_and_publish(
    table: IceboxTable,
    checks: Sequence[Callable[[DataFrame], "bool | str"]],
    version: int | None = None,
) -> dict:
    """Run ``checks`` over the changelog published→target; publish on
    unanimous pass.

    Each check receives the :func:`table_changes` DataFrame (columns
    ``change, doc_id, …payload…, old_offset, new_offset``) and returns
    truthy to approve, or falsy / a reason string prefixed with ``!`` to
    veto. On veto, :class:`AuditFailed` carries the reasons and the ref
    stays — consumers keep reading the last good version while the bad
    batch is investigated (or rolled forward by a corrective commit).
    """
    target = table.current_version() if version is None else int(version)
    base = published_version(table)
    if target <= base:
        return {"published": base, "skipped": True}
    ch = table_changes(table, base, target)
    reasons: list[str] = []
    for check in checks:
        verdict = check(ch)
        if isinstance(verdict, str) and verdict.startswith("!"):
            reasons.append(verdict[1:])
        elif not verdict:
            reasons.append(getattr(check, "__name__", "check"))
    if reasons:
        raise AuditFailed(
            f"publish {base} -> {target} vetoed: {', '.join(reasons)}"
        )
    return {"published": publish(table, target), "from": base, "to": target}
