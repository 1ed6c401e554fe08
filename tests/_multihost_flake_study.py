#!/usr/bin/env python3
"""Gloo rendezvous flake study (round-4 verdict weak #3 / next-round #7).

Round 4 papered over a rendezvous timeout with a one-shot retry; the root
cause (port collision vs load) was undiagnosed. This script reproduces the
failure mode deliberately: it launches N iterations of TWO worker pairs
CONCURRENTLY (mimicking xdist running both multihost tests at once), with
retries disabled, and records for each pair the chosen coordinator port,
outcome, and failure signature. The discriminating evidence:

  * port collision (the TOCTOU in _free_port: the probe socket is closed
    ~5-10 s before the coordinator worker actually binds the port, so the
    other test's bind(0) can be handed the same port): failures correlate
    with equal ports across the two concurrent pairs;
  * load/timeout: failures appear with distinct ports under CPU saturation.

Usage:  python tests/_multihost_flake_study.py [N_ITERS] [--collide]
        --collide forces BOTH pairs onto one port (positive control).
"""

import concurrent.futures as cf
import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    return env


def run_pair(worker, port):
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=300) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        outs = [p.communicate() for p in procs]
        return {"port": port, "ok": False, "sig": "HANG(300s)",
                "secs": round(time.time() - t0, 1)}
    fails = [err for p, (_, err) in zip(procs, outs) if p.returncode != 0]
    sig = ""
    if fails:
        err = fails[0]
        for pat in ("Gloo", "Connect timeout", "connect timed out",
                    "barrier timed out", "Address already in use",
                    "DEADLINE_EXCEEDED", "UNAVAILABLE"):
            if pat in err:
                sig += pat + ";"
        sig = sig or err.strip().splitlines()[-1][-120:]
    return {"port": port, "ok": not fails, "sig": sig,
            "secs": round(time.time() - t0, 1)}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    collide = "--collide" in sys.argv
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multihost_worker.py")
    results = []
    for it in range(n):
        if collide:
            p = _free_port()
            ports = (p, p)
        else:
            ports = (_free_port(), _free_port())
        with cf.ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(run_pair, worker, p) for p in ports]
            recs = [f.result() for f in futs]
        same = ports[0] == ports[1]
        row = {"iter": it, "same_port": same, "a": recs[0], "b": recs[1]}
        results.append(row)
        print(json.dumps(row), flush=True)
    fails = [r for r in results if not (r["a"]["ok"] and r["b"]["ok"])]
    print(json.dumps({
        "iters": n, "fail_iters": len(fails),
        "fails_with_same_port": sum(1 for r in fails if r["same_port"]),
        "fails_with_distinct_ports": sum(1 for r in fails if not r["same_port"]),
    }))


if __name__ == "__main__":
    main()
