"""PostgreSQL wire server tests with a minimal hand-rolled client
(reference: server tests boot the real server and talk libpqxx,
server_test_runner.cpp; our client speaks the raw protocol)."""

import socket
import struct

import numpy as np
import pandas as pd

from hyrise_tpu.server import Server
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.table import Table


class MiniPgClient:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=10)

    def startup(self):
        body = struct.pack("!I", 196608) + b"user\x00test\x00\x00"
        self.sock.sendall(struct.pack("!I", len(body) + 4) + body)
        msgs = self.read_until(b"Z")
        assert any(t == b"R" for t, _ in msgs)
        return msgs

    def query(self, sql):
        payload = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(payload) + 4) + payload)
        return self.read_until(b"Z")

    def read_msg(self):
        tag = self._exact(1)
        length = struct.unpack("!I", self._exact(4))[0]
        return tag, self._exact(length - 4)

    def read_until(self, stop_tag):
        out = []
        while True:
            t, body = self.read_msg()
            out.append((t, body))
            if t == stop_tag:
                return out

    def _exact(self, n):
        data = b""
        while len(data) < n:
            chunk = self.sock.recv(n - len(data))
            if not chunk:
                raise ConnectionError
            data += chunk
        return data

    def rows(self, msgs):
        out = []
        for t, body in msgs:
            if t != b"D":
                continue
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
            out.append(tuple(row))
        return out

    def close(self):
        self.sock.sendall(b"X" + struct.pack("!I", 4))
        self.sock.close()


def _start_server():
    cat = Catalog()
    cat.add_table("t", Table.from_pandas("t", pd.DataFrame({
        "a": np.array([1, 2, 3], dtype=np.int32),
        "s": np.array(["x", "y", "z"], dtype=object),
    })))
    srv = Server(port=0, catalog=cat)
    srv.serve_background()
    return srv, srv.server_address[1]


def test_simple_query_roundtrip():
    srv, port = _start_server()
    try:
        c = MiniPgClient(port)
        c.startup()
        msgs = c.query("SELECT a, s FROM t WHERE a > 1 ORDER BY a")
        rows = c.rows(msgs)
        assert rows == [("2", "y"), ("3", "z")]
        assert any(t == b"T" for t, _ in msgs)  # RowDescription
        assert any(t == b"C" for t, _ in msgs)  # CommandComplete
        c.close()
    finally:
        srv.shutdown()


def test_error_response_keeps_session():
    srv, port = _start_server()
    try:
        c = MiniPgClient(port)
        c.startup()
        msgs = c.query("SELECT nope FROM t")
        assert any(t == b"E" for t, _ in msgs)
        # session still usable
        rows = c.rows(c.query("SELECT a FROM t WHERE a = 1"))
        assert rows == [("1",)]
        c.close()
    finally:
        srv.shutdown()


def test_client_binary_roundtrip():
    """bin/client.py (reference: src/bin/client.cpp libpqxx smoke client)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "bin"))
    from client import PgWireClient

    srv, port = _start_server()
    try:
        c = PgWireClient(port=port, host="127.0.0.1")
        cols, rows, notes = c.query("SELECT a FROM t ORDER BY a")
        assert cols == ["a"]
        assert [r[0] for r in rows] == sorted(r[0] for r in rows)
        c.close()
    finally:
        srv.shutdown()
