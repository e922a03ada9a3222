"""Live socket front for the plain Graphite protocol (S1/S2 parity).

The reference accepts TCP and UDP connections directly
(receiver/tcp.go:101-147, receiver/udp.go:34-95). Spark's own socket
source has no replay and a single-connection model, so the Spark-first
shape is a thin listener that lands COMPLETE protocol lines as atomic
chunk files in a landing directory, which
:func:`streaming.ingest.file_landing_source` streams with full
replay/exactly-once semantics. This module is that bridge: a
carbon-relay (or netcat) can point at it and rows come out of the
micro-batch pipeline.

Framing follows the reference: partial lines are buffered across TCP
reads and flushed when the terminating newline arrives; data left
without a newline when a connection closes is dropped, as is the
unterminated tail of a UDP datagram. Chunk files are written to a
temp name and ``os.replace``d into the landing dir so the Spark file
source never observes a partially-written chunk.
"""

from __future__ import annotations

import os
import socket
import socketserver
import threading
import time
import uuid


class _ChunkWriter:
    """Thread-safe line buffer -> atomic chunk files."""

    def __init__(self, landing_dir: str, flush_lines: int, flush_interval: float):
        self.landing_dir = landing_dir
        self.flush_lines = flush_lines
        self.flush_interval = flush_interval
        self._lines: list[bytes] = []
        self._lock = threading.Lock()
        self._last_flush = time.monotonic()
        os.makedirs(landing_dir, exist_ok=True)

    def add(self, lines: list[bytes]) -> None:
        with self._lock:
            self._lines.extend(lines)
            if len(self._lines) >= self.flush_lines:
                self._flush_locked()

    def maybe_flush(self) -> None:
        with self._lock:
            if self._lines and (
                time.monotonic() - self._last_flush >= self.flush_interval
            ):
                self._flush_locked()

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        self._last_flush = time.monotonic()
        if not self._lines:
            return
        name = f"chunk-{time.time_ns()}-{uuid.uuid4().hex[:8]}.txt"
        tmp = os.path.join(self.landing_dir, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(b"\n".join(self._lines) + b"\n")
        os.replace(tmp, os.path.join(self.landing_dir, name))
        self._lines = []


class PlainLineReceiver:
    """TCP (+ optional UDP) plain-protocol listener -> landing dir.

    Start/stop lifecycle; ``port``/``udp_port`` expose the bound
    ports (pass 0 to pick free ones). A background timer flushes
    buffered lines every ``flush_interval`` seconds so low-rate
    senders still land promptly (the reference's chunk-interval
    analogue; K2's adaptive governor runs downstream)."""

    def __init__(
        self,
        landing_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        tcp: bool = True,
        udp: bool = False,
        udp_port: int = 0,
        flush_lines: int = 50_000,
        flush_interval: float = 0.25,
    ):
        self.writer = _ChunkWriter(landing_dir, flush_lines, flush_interval)
        self.host = host
        writer = self.writer

        class TCPHandler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                buf = b""
                while True:
                    try:
                        data = self.request.recv(65536)
                    except OSError:
                        break
                    if not data:
                        break
                    buf += data
                    if b"\n" in buf:
                        *complete, buf = buf.split(b"\n")
                        writer.add([ln.rstrip(b"\r") for ln in complete if ln])
                # trailing bytes without a newline are dropped
                # (reference semantics: the line never completed)

        class UDPHandler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                data = self.request[0]
                # drop the unterminated tail; when the datagram ends in
                # a newline the dropped element is the empty remainder
                complete = data.split(b"\n")[:-1]
                writer.add([ln.rstrip(b"\r") for ln in complete if ln])

        class _TCPServer(socketserver.ThreadingTCPServer):
            daemon_threads = True
            allow_reuse_address = True

        # UDP-only mode must not bind an unrequested TCP port
        self._tcp = _TCPServer((host, port), TCPHandler) if tcp else None
        self.port = self._tcp.server_address[1] if self._tcp else None
        self._udp = None
        self.udp_port = None
        if udp:
            self._udp = socketserver.ThreadingUDPServer((host, udp_port), UDPHandler)
            self._udp.daemon_threads = True
            self.udp_port = self._udp.server_address[1]
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()
        self._started = False

    def start(self) -> "PlainLineReceiver":
        self._started = True
        for srv in filter(None, (self._tcp, self._udp)):
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            self._threads.append(t)

        def ticker() -> None:
            while not self._stop.wait(self.writer.flush_interval):
                self.writer.maybe_flush()

        t = threading.Thread(target=ticker, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def stop(self) -> None:
        self._stop.set()
        for srv in filter(None, (self._tcp, self._udp)):
            # shutdown() waits on an event only serve_forever() sets —
            # calling it on a never-started server would deadlock
            if self._started:
                srv.shutdown()
            # block_on_close (default) makes server_close() JOIN all
            # handler threads, so every line a handler buffered is in
            # the writer before the final flush below — do not set
            # block_on_close=False or received data could be dropped
            srv.server_close()
        self.writer.flush()


def send_lines(host: str, port: int, lines: list[str], chunk: int = 8192) -> None:
    """netcat-equivalent test helper: stream newline-joined lines over
    one TCP connection in arbitrary byte chunks (exercises partial-
    frame reassembly on the receiver)."""
    payload = ("\n".join(lines) + "\n").encode()
    with socket.create_connection((host, port)) as s:
        for i in range(0, len(payload), chunk):
            s.sendall(payload[i : i + chunk])
