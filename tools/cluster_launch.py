#!/usr/bin/env python3
"""Dev harness: bring up an N-process lockstep serving cluster locally.

One command spawns N `infercam_onnx_tpu.serve` processes joined through
`jax.distributed` (localhost coordinator) and the lockstep dispatch tier
(parallel/lockstep.py), each with its own HTTP + ingest ports::

    python tools/cluster_launch.py --hosts 2 --cpu
    # host 0: http://127.0.0.1:3000  ingest 127.0.0.1:3001
    # host 1: http://127.0.0.1:3010  ingest 127.0.0.1:3011

Feed each "host" with its own sender (any reference-compatible sender
works) and watch its own /face_stream. Ctrl-C tears the cluster down.
`--cpu` forces the CPU backend (N virtual hosts on one machine — the
development topology; on real pod-slice hosts run one serve per host
with the same flags instead, see docs/OPERATIONS.md).

Extra arguments after `--` pass through to every serve process::

    python tools/cluster_launch.py --hosts 2 --cpu -- --decode-mode ycbcr
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    passthrough: list[str] = []
    if "--" in argv:
        i = argv.index("--")
        argv, passthrough = argv[:i], argv[i + 1:]

    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--hosts", type=int, default=2,
                    help="number of serve processes (default 2)")
    ap.add_argument("--http-base", type=int, default=3000,
                    help="host i serves HTTP on http_base + 10*i")
    ap.add_argument("--coordinator-port", type=int, default=3999)
    ap.add_argument("--lockstep-port", type=int, default=3998)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (local dev topology)")
    args = ap.parse_args(argv)

    env = dict(os.environ)
    if args.cpu:
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["XLA_FLAGS"] = ""

    procs: list[subprocess.Popen] = []
    endpoints = []
    try:
        for pid in range(args.hosts):
            http = args.http_base + 10 * pid
            ingest = http + 1
            endpoints.append((pid, http, ingest))
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "infercam_onnx_tpu.serve",
                 "--server-address", f"127.0.0.1:{http}",
                 "--socket-address", f"127.0.0.1:{ingest}",
                 "--distributed",
                 f"127.0.0.1:{args.coordinator_port},"
                 f"num_processes={args.hosts},process_id={pid}",
                 "--lockstep-address",
                 f"127.0.0.1:{args.lockstep_port}",
                 "--data-parallel", "on",
                 *passthrough],
                env=env))
        for pid, http, ingest in endpoints:
            print(f"host {pid}: http://127.0.0.1:{http}  "
                  f"ingest 127.0.0.1:{ingest}")
        print("Ctrl-C stops the cluster.", flush=True)
        while True:
            for p in procs:
                code = p.poll()
                if code is not None:
                    print(f"a member exited with code {code}; "
                          "stopping the cluster", file=sys.stderr)
                    return code or 1
            time.sleep(1.0)
    except KeyboardInterrupt:
        return 0
    finally:
        for p in procs:
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)
        deadline = time.time() + 15
        for p in procs:
            try:
                p.wait(max(0.1, deadline - time.time()))
            except subprocess.TimeoutExpired:
                p.kill()


if __name__ == "__main__":
    sys.exit(main())
