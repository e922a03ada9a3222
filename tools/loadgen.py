"""Load generator for the live fronts — the engine's analogue of the
reference's ``receiver/grpc_sender/loadtest.go`` utility, generalized
to the plain TCP/UDP protocol (the front every deployment runs).

Generates ``hosts x plugins x values`` series shaped exactly like the
reference's loadtest corpus (``loadtest.host<h>.plugin<p>.stuff<v>.value``)
and ships them as plain graphite lines at a target rate, reporting the
achieved throughput as one JSON line — feed it a listener started by
``python -m carbon_clickhouse_spark --config ...`` and watch
``/debug``/self-metrics on the other side.

Usage:
    python tools/loadgen.py --port 2003 [--host 127.0.0.1] [--udp]
        [--hosts 10] [--plugins 10] [--values 10] [--seconds 10]
        [--rate 0]          # lines/sec target; 0 = as fast as possible
        [--hostfactor 1]    # reference flag: offsets the host numbers
"""

from __future__ import annotations

import argparse
import json
import math
import socket
import time


def make_lines(hosts: int, plugins: int, values: int, host_start: int, now: int) -> list[bytes]:
    """One point per series, deterministic values (sin ramp — the
    reference uses NormFloat64; determinism is more useful for
    verifying receipt counts)."""
    out = []
    i = 0
    for h in range(hosts):
        for p in range(plugins):
            for v in range(values):
                val = math.sin(i * 0.1) * 100
                out.append(
                    b"loadtest.host%d.plugin%d.stuff%d.value %.4f %d\n"
                    % (h + host_start, p, v, val, now)
                )
                i += 1
    return out


def run(args) -> dict:
    lines = make_lines(
        args.hosts, args.plugins, args.values, args.hostfactor, int(time.time())
    )
    sent = 0
    start = time.monotonic()
    deadline = start + args.seconds
    if args.udp:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        send_batch = lambda b: sock.sendto(b, (args.host, args.port))  # noqa: E731
        batch_lines = 25  # keep datagrams under typical MTU budgets
    else:
        sock = socket.create_connection((args.host, args.port), timeout=10)
        send_batch = sock.sendall
        batch_lines = 500
    try:
        while time.monotonic() < deadline:
            now = int(time.time())
            for i in range(0, len(lines), batch_lines):
                batch = lines[i : i + batch_lines]
                # refresh timestamps per wave so points don't collapse
                send_batch(b"".join(b.rsplit(b" ", 1)[0] + b" %d\n" % now for b in batch))
                sent += len(batch)
                if args.rate:
                    # pace to the requested lines/sec
                    target_t = start + sent / args.rate
                    sleep = target_t - time.monotonic()
                    if sleep > 0:
                        time.sleep(sleep)
                if time.monotonic() >= deadline:
                    break
    finally:
        sock.close()
    elapsed = time.monotonic() - start
    return {
        "metric": "loadgen_lines_per_sec",
        "value": round(sent / elapsed, 1),
        "unit": "lines/sec",
        "sent": sent,
        "seconds": round(elapsed, 3),
        "series": args.hosts * args.plugins * args.values,
        "protocol": "udp" if args.udp else "tcp",
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--udp", action="store_true")
    ap.add_argument("--hosts", type=int, default=10)
    ap.add_argument("--plugins", type=int, default=10)
    ap.add_argument("--values", type=int, default=10)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--rate", type=float, default=0.0)
    ap.add_argument("--hostfactor", type=int, default=0)
    print(json.dumps(run(ap.parse_args())), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
