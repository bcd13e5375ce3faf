"""Minimal PostgreSQL-wire test client (reference: src/bin/client.cpp, a
libpqxx smoke client that connects, runs queries, and prints rows).

Speaks the raw protocol (startup / SimpleQuery / RowDescription / DataRow)
against hyrise_tpu's server with no client library dependency.

Usage:
    python bin/client.py [--host 127.0.0.1] [--port 54321] "SELECT ..." ...
    python bin/client.py --port 54321          # read statements from stdin
"""

from __future__ import annotations

import argparse
import socket
import struct
import sys


class PgWireClient:
    def __init__(self, host: str, port: int, user: str = "hyrise"):
        self.sock = socket.create_connection((host, port), timeout=30)
        body = struct.pack("!I", 196608) + f"user\x00{user}\x00\x00".encode()
        self.sock.sendall(struct.pack("!I", len(body) + 4) + body)
        self._read_until(b"Z")

    def query(self, sql: str):
        """Run one simple query; returns (column_names, rows, messages)."""
        payload = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(payload) + 4) + payload)
        msgs = self._read_until(b"Z")
        cols, rows, notes = [], [], []
        for tag, body in msgs:
            if tag == b"T":  # RowDescription
                n = struct.unpack("!H", body[:2])[0]
                off = 2
                for _ in range(n):
                    end = body.index(b"\x00", off)
                    cols.append(body[off:end].decode())
                    off = end + 1 + 18
            elif tag == b"D":  # DataRow
                n = struct.unpack("!H", body[:2])[0]
                off = 2
                row = []
                for _ in range(n):
                    ln = struct.unpack("!i", body[off:off + 4])[0]
                    off += 4
                    if ln < 0:
                        row.append(None)
                    else:
                        row.append(body[off:off + ln].decode())
                        off += ln
                rows.append(tuple(row))
            elif tag == b"C":  # CommandComplete
                notes.append(body.rstrip(b"\x00").decode())
            elif tag == b"E":  # ErrorResponse
                raise RuntimeError(f"server error: {body!r}")
        return cols, rows, notes

    def close(self):
        self.sock.sendall(b"X" + struct.pack("!I", 4))
        self.sock.close()

    def _read_until(self, stop_tag):
        out = []
        while True:
            tag = self._exact(1)
            length = struct.unpack("!I", self._exact(4))[0]
            out.append((tag, self._exact(length - 4)))
            if tag == stop_tag:
                return out

    def _exact(self, n: int) -> bytes:
        data = b""
        while len(data) < n:
            chunk = self.sock.recv(n - len(data))
            if not chunk:
                raise ConnectionError("server closed the connection")
            data += chunk
        return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=54321)
    ap.add_argument("statements", nargs="*")
    args = ap.parse_args()

    stmts = args.statements or [line.strip() for line in sys.stdin
                                if line.strip()]
    client = PgWireClient(args.host, args.port)
    try:
        for sql in stmts:
            cols, rows, notes = client.query(sql)
            if cols:
                print("\t".join(cols))
            for r in rows:
                print("\t".join("NULL" if v is None else v for v in r))
            for n in notes:
                print(f"-- {n}", file=sys.stderr)
    finally:
        client.close()


if __name__ == "__main__":
    main()
