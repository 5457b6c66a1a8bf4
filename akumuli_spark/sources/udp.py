"""UDP transport for RESP ingestion — the datagram analogue of the
reference's UdpServer (/root/reference/akumulid/udp_server.h:34-60,
udp_server.cpp).

Reference semantics preserved:

* each datagram is parsed INDEPENDENTLY (the reference instantiates a
  fresh ProtocolParser per packet — no cross-packet buffering), so a PDU
  may not span datagrams;
* malformed packets are counted and dropped, never fatal (the reference
  logs and keeps serving).  The count is split across the two places a
  packet can be bad: ``UdpSpool.n_errors`` counts UTF-8 decode failures
  at receive time; RESP-malformed datagrams are dropped (and counted)
  downstream by ``parse_resp_stage(on_error="skip", dropped_acc=...)``;
* max datagram size 64 KiB (``MSS = 0x10000``).

Spark wiring: Structured Streaming has no UDP source, so the receiver
spools each datagram to its own file in a directory consumed by
:func:`akumuli_spark.streaming.ingest.parsed_stream_from_files` — the
``wholetext`` file source keeps one datagram per row, which is exactly
the per-packet parser instantiation the reference performs.  Files are
written atomically (tmp + rename) so the streaming source never observes
a partial datagram.
"""

from __future__ import annotations

import os
import socket
import threading
import uuid

MSS = 0x10000  # udp_server.h:50


class UdpSpool:
    """Bind a UDP socket and spool each received datagram to
    ``spool_dir`` as one file.

    >>> spool = UdpSpool(spool_dir); spool.start()
    >>> stream = parsed_stream_from_files(spark, spool_dir)
    >>> ... start_parquet_ingest(stream, ...) ...
    >>> spool.stop()
    """

    def __init__(self, spool_dir: str, host: str = "127.0.0.1",
                 port: int = 0) -> None:
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_dir = spool_dir
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind((host, port))
        self.sock.settimeout(0.1)
        self.host, self.port = self.sock.getsockname()
        self.n_datagrams = 0
        self.n_errors = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                data, _ = self.sock.recvfrom(MSS)
            except socket.timeout:
                continue
            except OSError:
                break
            try:
                text = data.decode("utf-8")
            except UnicodeDecodeError:
                self.n_errors += 1  # dropped, not fatal (udp_server.cpp)
                continue
            tmp = os.path.join(self.spool_dir, f".{uuid.uuid4().hex}.tmp")
            final = os.path.join(
                self.spool_dir, f"dgram-{self.n_datagrams:08d}-{uuid.uuid4().hex}.txt"
            )
            with open(tmp, "w") as f:
                f.write(text)
            os.rename(tmp, final)
            self.n_datagrams += 1

    def start(self) -> "UdpSpool":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.sock.close()
