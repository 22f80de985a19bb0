"""Spool compaction — the OPTIMIZE/small-files maintenance job.

A long-running streaming sink accumulates one file per (micro-batch,
task): at a 10 s trigger that is ~8.6k files/day/partition — the classic
small-files problem that degrades every downstream scan (file-open
overhead dominates, splits can't be coalesced, object-store LIST calls
explode).  This job rewrites committed spool files into
target-size segments and atomically swaps the manifest, preserving:

  * exactly-once visibility: readers trust only `_manifest`; the new
    manifest is written to a temp file and `os.replace`d (atomic on
    POSIX), so a reader sees either the old file set or the new one,
    never a mix;
  * epoch idempotence: compacted entries carry the full `epochs` list
    they absorbed, so a replayed `commit(epoch)` after a restart still
    detects its epoch as committed (`SpoolStreamWriter._committed_epochs`
    accepts both entry shapes);
  * row fidelity: JSONL/spool lines concatenate byte-for-byte — no
    parse/re-serialize step, so compaction cannot corrupt or reorder
    rows within a source file.

This is the driver-local twin of what a table format's OPTIMIZE runs as
a distributed job at 100 TB (bin-pack file groups per partition,
rewrite, swap metadata atomically); the protocol — bin-pack, write
invisible, swap manifest, then delete — is identical, only the rewrite
executor changes.

Reference context: the reference appends rows to SQL tables and has no
file layout to maintain; this is extension surface for the file-spool
pipeline (sinks/spool.py ↔ sources/mqtt.FileSpoolTransport).
"""

from __future__ import annotations

import json
import os
import uuid

DEFAULT_TARGET_BYTES = 64 * 1024 * 1024


def _entry_epochs(entry: dict) -> list[int]:
    if "epochs" in entry:
        return list(entry["epochs"])
    return [entry["epoch"]]


def compact_spool(
    path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Bin-pack committed spool files into ~target_bytes segments.

    Returns {"files_before", "files_after", "bytes", "compacted"}.
    No-op (compacted=0) when every bin would contain a single file.
    """
    manifest = os.path.join(path, "_manifest")
    try:
        with open(manifest) as f:
            entries = [json.loads(line) for line in f if line.strip()]
    except FileNotFoundError:
        return {"files_before": 0, "files_after": 0, "bytes": 0,
                "compacted": 0}

    # flatten to (file, size, epochs) preserving manifest order — readers
    # that care about arrival order keep it across compaction
    flat: list[tuple[str, int, list[int]]] = []
    rows_total = 0
    for e in entries:
        rows_total += e.get("rows", 0)
        for fname in e["files"]:
            fpath = os.path.join(path, fname)
            flat.append((fname, os.path.getsize(fpath), _entry_epochs(e)))

    # greedy bin-pack in order
    bins: list[list[tuple[str, int, list[int]]]] = []
    cur: list[tuple[str, int, list[int]]] = []
    cur_bytes = 0
    for item in flat:
        if cur and cur_bytes + item[1] > target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append(item)
        cur_bytes += item[1]
    if cur:
        bins.append(cur)

    if all(len(b) <= 1 for b in bins):
        return {
            "files_before": len(flat),
            "files_after": len(flat),
            "bytes": sum(sz for _, sz, _ in flat),
            "compacted": 0,
        }

    tmp_dir = os.path.join(path, ".inprogress")
    os.makedirs(tmp_dir, exist_ok=True)
    gen = uuid.uuid4().hex[:8]
    new_entries: list[dict] = []
    replaced: list[str] = []
    n_compacted = 0
    for i, b in enumerate(bins):
        if len(b) == 1:
            # single-file bin: keep the file, carry its epochs forward
            fname, _sz, epochs = b[0]
            new_entries.append(
                {"epochs": sorted(set(epochs)), "files": [fname]}
            )
            continue
        out_name = f"compact-{gen}-{i:04d}.jsonl"
        tmp_path = os.path.join(tmp_dir, out_name)
        epochs: set[int] = set()
        with open(tmp_path, "wb") as out:
            for fname, _sz, eps in b:
                epochs.update(eps)
                with open(os.path.join(path, fname), "rb") as src:
                    data = src.read()
                    out.write(data)
                    if data and not data.endswith(b"\n"):
                        out.write(b"\n")
            out.flush()
            os.fsync(out.fileno())
        os.replace(tmp_path, os.path.join(path, out_name))
        new_entries.append(
            {"epochs": sorted(epochs), "files": [out_name]}
        )
        replaced.extend(fname for fname, _sz, _e in b)
        n_compacted += len(b)

    # atomic manifest swap: readers see old or new set, never a mix
    tmp_manifest = manifest + ".tmp"
    with open(tmp_manifest, "w") as f:
        for e in new_entries:
            f.write(json.dumps(e) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_manifest, manifest)

    for fname in replaced:
        try:
            os.unlink(os.path.join(path, fname))
        except FileNotFoundError:
            pass

    files_after = sum(len(e["files"]) for e in new_entries)
    return {
        "files_before": len(flat),
        "files_after": files_after,
        "bytes": sum(
            os.path.getsize(os.path.join(path, f))
            for e in new_entries
            for f in e["files"]
        ),
        "compacted": n_compacted,
    }
