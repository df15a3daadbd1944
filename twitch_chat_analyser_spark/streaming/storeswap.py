"""Shared atomic-swap + crash-recovery for the flat (non-bucketed)
streaming store directories (ohlc / markov / kmv).

Swap sequence: write ``<path>.tmp-*`` -> rename(live -> ``.old-*``)
-> rename(tmp -> live) -> delete backup. A crash between the two
renames strands a backup whose live dir is MISSING — without recovery
the next merge would silently start from an empty store and lose all
history. :func:`recover` (called before every read/merge) restores
such a backup, drops superseded backups, and clears stale ``.tmp-*``
write dirs (their merge never swapped in; checkpoint replay re-runs
that batch). Single-writer assumption: foreachBatch serializes merges
per query — same contract as streaming/hll.py's bucketed twin.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


class StoreSwapError(OSError):
    """The publish rename failed even after the heal-race retake.
    Raised (never swallowed) so the micro-batch fails and Structured
    Streaming replays it — the journal travels inside the unpublished
    tmp dir, so the replay re-applies exactly the lost batch."""


def _fsync_file(fh) -> None:
    fh.flush()
    os.fsync(fh.fileno())


def _fsync_dir(path: str) -> None:
    """Directory-entry durability: ``fsync(file)`` persists the bytes,
    NOT the file's name in its directory — POSIX permits a power loss
    to surface a published dir whose journal file is absent unless the
    dir itself is fsynced before the publishing rename (review r11;
    ext4's ordered journaling saves you incidentally, other filesystems
    do not). Platforms without dir fsync (the open or the fsync
    reports not-supported) keep rename atomicity, which is the
    stronger half of the guarantee — but a GENUINE I/O failure
    (EIO/ENOSPC on a failing disk) must propagate so the micro-batch
    fails and replays; swallowing it would re-open exactly the
    power-loss double-apply window this call exists to close
    (ADVICE r11)."""
    import errno

    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        # directories aren't openable O_RDONLY everywhere (e.g.
        # Windows) — that's "no dir fsync on this platform", not a
        # disk failure
        return
    try:
        try:
            os.fsync(fd)
        except OSError as exc:
            if exc.errno not in (
                errno.EINVAL, errno.ENOTSUP, errno.EOPNOTSUPP,
                errno.EBADF,
            ):
                raise
    finally:
        os.close(fd)


def _mtime(parent: str, entry: str) -> float:
    try:
        return os.path.getmtime(os.path.join(parent, entry))
    except OSError:
        return 0.0


def recover(path: str, restore_only: bool = False) -> None:
    """Make a torn swap whole.

    ``restore_only=True`` is the READ-path mode: it still restores a
    stranded ``.old-*`` backup whose live dir is missing (the torn-swap
    case a reader must heal to see history), but never deletes
    anything — a serving call concurrent with an in-flight foreachBatch
    merge must not rmtree the writer's ``.tmp-*`` dir mid-write or drop
    the backup between the writer's two renames. Cleanup of stale tmp
    dirs and superseded backups belongs to the single writer, which
    calls the default (full) mode before each merge."""
    parent = os.path.dirname(os.path.abspath(path)) or "."
    base = os.path.basename(path)
    if not os.path.isdir(parent):
        return
    # newest backup first: if a silently-failed deletion left a STALE
    # backup alongside a freshly stranded one, random-hex name order
    # could restore the stale one and delete the fresh one as
    # superseded — mtime order makes the choice deterministic
    entries = sorted(
        os.listdir(parent), key=lambda e: _mtime(parent, e), reverse=True
    )
    for entry in entries:
        full = os.path.join(parent, entry)
        if entry.startswith(f"{base}.old-"):
            if not os.path.isdir(path):
                # torn swap: restore history. Guarded: two concurrent
                # restore_only readers can both pass the isdir check,
                # or a reader can race the single writer between its
                # two renames — losing the rename race means the other
                # party already made the store whole (no data loss),
                # so a failed rename here is success, not a crash.
                try:
                    os.rename(full, path)
                except OSError:
                    pass
            elif not restore_only:
                shutil.rmtree(full, ignore_errors=True)  # superseded
        elif entry.startswith(f"{base}.tmp-") and not restore_only:
            shutil.rmtree(full, ignore_errors=True)  # never swapped in


def swap_in(
    merged: DataFrame, path: str, journal_ids=None, journal_stream=None
) -> None:
    """Write ``merged`` as the new live store via the two-rename swap;
    optionally journal applied batch ids INSIDE the new dir (committed
    by the same rename that publishes the data). ``journal_stream``
    records which streaming checkpoint the ids belong to (v2 journal
    format — see bucketstore._check_stream for why identity matters
    to the watermark replay test)."""
    import json

    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    if journal_ids is not None:
        # journal data must be on disk before the publishing rename —
        # a power loss could otherwise publish a store whose journal is
        # truncated, and a replay would double-apply the batch
        payload = (
            {"stream": journal_stream, "ids": sorted(journal_ids)}
            if journal_stream else sorted(journal_ids)
        )
        with open(os.path.join(tmp, "_applied_batches.json"), "w") as fh:
            json.dump(payload, fh)
            _fsync_file(fh)
        # the journal's DIRECTORY ENTRY must be durable too, or a power
        # loss can publish the data without its journal (review r11)
        _fsync_dir(tmp)
    back = f"{path}.old-{uuid.uuid4().hex[:8]}"
    had_old = os.path.isdir(path)
    if had_old:
        os.rename(path, back)
    try:
        os.rename(tmp, path)
    except OSError:
        # a concurrent recover(restore_only=True) reader may have
        # healed the backup back into place between our two renames —
        # retake once (same contract as bucketstore._swap_bucket); a
        # second loss must FAIL the batch, not report success
        back2 = f"{path}.old-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(path, back2)
            os.rename(tmp, path)
        except OSError as exc:
            raise StoreSwapError(
                f"{path}: publish rename failed twice; failing the "
                "micro-batch so the checkpoint replays it"
            ) from exc
        shutil.rmtree(back2, ignore_errors=True)
    # make the publish rename itself durable (parent dir entry)
    _fsync_dir(os.path.dirname(os.path.abspath(path)) or ".")
    if had_old:
        shutil.rmtree(back, ignore_errors=True)
