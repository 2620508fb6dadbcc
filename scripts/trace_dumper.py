#!/usr/bin/env python
"""Parallel trace-fixture downloader (reference parity:
integration/tests/trace_dumper.py — chunk layout from the coordinator's
/api/chunks, block traces from l2geth, MAX_PARALLEL_DOWNLOADS workers,
skip-if-present resume).

Usage:
    python scripts/trace_dumper.py BATCH_ID [CHUNK_ID] \
        --l2geth-url http://node:8545 --rollupscan-url http://coord:8560/api \
        --out extra_traces

Writes extra_traces/batch_<B>/chunk_<C>/block_<N>.json — the directory
shape `utils.test_util.load_chunk`/`load_batch` consume. Network calls go
through `orchestration.clients` (injectable transports: unit-testable in a
zero-egress environment).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from concurrent.futures import ThreadPoolExecutor, as_completed

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MAX_PARALLEL_DOWNLOADS = 4


def dump_chunk(l2geth, chunk_dir: str, start_block: int, end_block: int) -> int:
    """Download [start, end] traces into chunk_dir; returns #fetched.
    Existing non-empty files are skipped (resume semantics, reference
    trace_dumper.py:44-46)."""
    os.makedirs(chunk_dir, exist_ok=True)
    fetched = 0
    for number in range(start_block, end_block + 1):
        path = os.path.join(chunk_dir, f"block_{number}.json")
        if os.path.exists(path) and os.path.getsize(path) > 0:
            continue
        trace = l2geth.get_block_trace_raw(number)
        with open(path, "w") as fh:
            json.dump(trace, fh, indent=2)
        fetched += 1
    return fetched


def dump_batch(
    l2geth,
    rollupscan,
    batch_id: int,
    out_dir: str,
    only_chunk: int | None = None,
    max_workers: int = MAX_PARALLEL_DOWNLOADS,
) -> dict[int, int]:
    """Fetch every chunk of a batch in parallel. Returns {chunk_index:
    #blocks fetched}."""
    chunks = rollupscan.get_chunk_info_by_batch_index(batch_id)
    batch_dir = os.path.join(out_dir, f"batch_{batch_id}")
    os.makedirs(batch_dir, exist_ok=True)
    results: dict[int, int] = {}
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futs = {}
        for ch in chunks:
            if only_chunk is not None and ch.index != only_chunk:
                continue
            chunk_dir = os.path.join(batch_dir, f"chunk_{ch.index}")
            futs[
                pool.submit(
                    dump_chunk, l2geth, chunk_dir,
                    ch.start_block_number, ch.end_block_number,
                )
            ] = ch.index
        for fut in as_completed(futs):
            results[futs[fut]] = fut.result()
    return results


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Dump block-trace fixtures for a batch")
    ap.add_argument("batch_id", type=int)
    ap.add_argument("chunk_id", type=int, nargs="?", default=None)
    ap.add_argument("--l2geth-url", default=os.environ.get("L2GETH_API_URL", ""))
    ap.add_argument(
        "--rollupscan-url", default=os.environ.get("ROLLUPSCAN_API_URL", "")
    )
    ap.add_argument("--out", default="extra_traces")
    ap.add_argument("--workers", type=int, default=MAX_PARALLEL_DOWNLOADS)
    args = ap.parse_args(argv)
    if not args.l2geth_url or not args.rollupscan_url:
        ap.error("--l2geth-url and --rollupscan-url (or env) are required")

    from scroll_prover_tpu.orchestration.clients import (
        L2gethClient,
        RollupscanClient,
    )

    res = dump_batch(
        L2gethClient(args.l2geth_url),
        RollupscanClient(args.rollupscan_url),
        args.batch_id,
        args.out,
        only_chunk=args.chunk_id,
        max_workers=args.workers,
    )
    for idx in sorted(res):
        print(f"chunk_{idx}: {res[idx]} blocks fetched")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
