"""PostgreSQL wire-protocol server.

Reference: src/lib/server/ — boost::asio sessions speaking the PostgreSQL
protocol (server_session.cpp:67-110 message loop; PostgresWireHandler packs
packets; QueryResponseBuilder row description + data rows), plus the server
task types dispatching to the scheduler, and src/bin/server.cpp.

Python implementation: a threaded socketserver handling the startup
handshake, SimpleQuery ('Q'), and the extended protocol's
Parse/Bind/Describe/Execute/Sync subset (enough for psql and most drivers
in simple mode). Text format only.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import List, Optional, Tuple

from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
from hyrise_tpu.storage.catalog import Catalog, default_catalog
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType

_OID_INT8 = 20
_OID_INT4 = 23
_OID_FLOAT4 = 700
_OID_FLOAT8 = 701
_OID_TEXT = 25

_TYPE_OID = {
    DataType.INT32: _OID_INT4,
    DataType.INT64: _OID_INT8,
    DataType.FLOAT32: _OID_FLOAT4,
    DataType.FLOAT64: _OID_FLOAT8,
    DataType.STRING: _OID_TEXT,
    DataType.NULL: _OID_TEXT,
}


def _typed_param(text: str, oid: int) -> object:
    """Decode a text-format Bind parameter by its Parse-declared type OID;
    with no declared OID, fall back to numeric-looking inference (matching
    drivers that send untyped placeholders)."""
    if oid in (_OID_INT4, _OID_INT8, 21):  # int2/int4/int8
        return int(text)
    if oid in (_OID_FLOAT4, _OID_FLOAT8, 1700):  # float4/float8/numeric
        return float(text)
    if oid:
        return text
    try:
        return int(text)
    except ValueError:
        try:
            return float(text)
        except ValueError:
            return text


def _pack_msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack("!I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class _Session:
    """One client connection (reference: ServerSessionImpl)."""

    def __init__(self, rfile, wfile, catalog: Catalog):
        self.rfile = rfile
        self.wfile = wfile
        self.catalog = catalog
        self._prepared: dict = {}      # name -> (sql, [param type OIDs])
        self._portal_sql: Optional[str] = None
        self._portal_params: Optional[List[object]] = None
        self._portal_result: Optional[Table] = None
        self._portal_described = False

    # -- low-level -----------------------------------------------------------

    def _read_exact(self, n: int) -> bytes:
        data = b""
        while len(data) < n:
            chunk = self.rfile.read(n - len(data))
            if not chunk:
                raise ConnectionError("client closed")
            data += chunk
        return data

    def _send(self, tag: bytes, payload: bytes = b"") -> None:
        self.wfile.write(_pack_msg(tag, payload))

    def _flush(self) -> None:
        self.wfile.flush()

    # -- startup -------------------------------------------------------------

    def startup(self) -> bool:
        length = struct.unpack("!I", self._read_exact(4))[0]
        body = self._read_exact(length - 4)
        proto = struct.unpack("!I", body[:4])[0]
        if proto == 80877103:  # SSLRequest -> refuse, continue plaintext
            self.wfile.write(b"N")
            self._flush()
            return self.startup()
        if proto == 80877102:  # CancelRequest
            return False
        self._send(b"R", struct.pack("!I", 0))  # AuthenticationOk
        for k, v in (("server_version", "14.0 (hyrise_tpu)"),
                     ("client_encoding", "UTF8")):
            self._send(b"S", _cstr(k) + _cstr(v))
        self._ready()
        return True

    def _ready(self) -> None:
        self._send(b"Z", b"I")
        self._flush()

    # -- responses -----------------------------------------------------------

    def _send_error(self, message: str) -> None:
        payload = b"SERROR" + b"\x00" + b"C42601" + b"\x00" + \
            b"M" + _cstr(message) + b"\x00"
        self._send(b"E", payload)

    def _send_row_description(self, table: Table) -> None:
        out = struct.pack("!H", len(table.columns))
        for c in table.columns:
            oid = _TYPE_OID[c.dtype]
            out += _cstr(c.name) + struct.pack("!IhIhih", 0, 0, oid, -1, -1, 0)
        self._send(b"T", out)

    def _send_rows(self, table: Table) -> int:
        decoded = [c.decode(table.num_rows) for c in table.columns]
        for i in range(table.num_rows):
            out = struct.pack("!H", len(table.columns))
            for col in decoded:
                v = col[i]
                if v is None:
                    out += struct.pack("!i", -1)
                else:
                    s = str(v).encode()
                    out += struct.pack("!i", len(s)) + s
            self._send(b"D", out)
        return table.num_rows

    def _execute_sql(self, sql: str,
                     params: Optional[List[object]] = None) -> Table:
        # plans cache per-operator outputs -> unsafe to share one plan object
        # across concurrent sessions; bypass the global plan cache here
        return (SQLPipelineBuilder(sql).with_catalog(self.catalog)
                .dont_cache_query_plans().with_params(params)
                .create_pipeline().get_result_table())

    def _run_sql(self, sql: str) -> None:
        sql = sql.strip().rstrip(";")
        if not sql:
            self._send(b"C", _cstr("EMPTY"))
            return
        result = self._execute_sql(sql)
        self._send_row_description(result)
        n = self._send_rows(result)
        self._send(b"C", _cstr(f"SELECT {n}"))

    # -- message loop --------------------------------------------------------

    def serve(self) -> None:
        if not self.startup():
            return
        while True:
            tag = self.rfile.read(1)
            if not tag or tag == b"X":  # Terminate
                return
            length = struct.unpack("!I", self._read_exact(4))[0]
            body = self._read_exact(length - 4)
            try:
                if tag == b"Q":  # SimpleQuery
                    sql = body.rstrip(b"\x00").decode()
                    try:
                        self._run_sql(sql)
                    except Exception as e:  # error -> ErrorResponse
                        self._send_error(str(e))
                    self._ready()
                elif tag == b"P":  # Parse: name, query, n param types+OIDs
                    name, rest = body.split(b"\x00", 1)
                    sql, rest = rest.split(b"\x00", 1)
                    oids: List[int] = []
                    if len(rest) >= 2:
                        n_oids = struct.unpack("!H", rest[:2])[0]
                        for i in range(n_oids):
                            oids.append(struct.unpack(
                                "!I", rest[2 + 4 * i:6 + 4 * i])[0])
                    self._prepared[name.decode()] = (sql.decode(), oids)
                    self._send(b"1", b"")  # ParseComplete
                elif tag == b"B":  # Bind: portal, statement, params...
                    parts = body.split(b"\x00", 2)
                    stmt_name = parts[1].decode()
                    sql, oids = self._prepared.get(stmt_name, ("", []))
                    self._portal_sql = sql
                    rest = parts[2]
                    nfmt = struct.unpack("!H", rest[:2])[0]
                    off = 2 + nfmt * 2
                    nparams = struct.unpack("!H", rest[off:off + 2])[0]
                    off += 2
                    # TYPED parameter values: decoded per the Parse OIDs
                    # (int/float/text), then substituted as literal AST
                    # nodes by the pipeline's prepared-statement path — a
                    # string containing quotes or '?' stays one literal,
                    # never re-parsed SQL (reference:
                    # server_session.cpp:67-110 typed AllTypeVariants)
                    params: List[object] = []
                    for pi in range(nparams):
                        plen = struct.unpack("!i", rest[off:off + 4])[0]
                        off += 4
                        if plen < 0:
                            params.append(None)
                            continue
                        text = rest[off:off + plen].decode()
                        off += plen
                        params.append(_typed_param(
                            text, oids[pi] if pi < len(oids) else 0))
                    self._portal_params = params if params else None
                    self._portal_result = None
                    self._portal_described = False
                    self._send(b"2", b"")  # BindComplete
                elif tag == b"D":  # Describe statement ('S') or portal ('P')
                    kind = body[:1]
                    if kind == b"P" and self._portal_sql:
                        # execute now, answer with the REAL row description;
                        # Execute drains the cached result
                        try:
                            self._portal_result = self._execute_sql(
                                self._portal_sql, self._portal_params)
                            self._send_row_description(self._portal_result)
                            self._portal_described = True
                        except Exception as e:
                            self._send_error(str(e))
                    elif kind == b"S":
                        name = body[1:].split(b"\x00")[0].decode()
                        sql, oids = self._prepared.get(name, ("", []))
                        # ParameterDescription from the Parse OIDs
                        self._send(b"t", struct.pack("!H", len(oids))
                                   + b"".join(struct.pack("!I", o)
                                              for o in oids))
                        self._send(b"n", b"")  # NoData (rows at Execute)
                    else:
                        self._send(b"n", b"")
                elif tag == b"E":  # Execute
                    try:
                        result = self._portal_result
                        if result is None:
                            result = self._execute_sql(
                                self._portal_sql or "",
                                self._portal_params)
                        if not self._portal_described:
                            self._send_row_description(result)
                        n = self._send_rows(result)
                        self._send(b"C", _cstr(f"SELECT {n}"))
                        self._portal_result = None
                        self._portal_described = False
                    except Exception as e:
                        self._send_error(str(e))
                elif tag == b"S":  # Sync
                    self._ready()
                elif tag == b"H":  # Flush
                    self._flush()
                else:
                    self._send_error(f"unsupported message {tag!r}")
                    self._ready()
            except ConnectionError:
                return


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        _Session(self.rfile, self.wfile, self.server.catalog).serve()


class Server(socketserver.ThreadingTCPServer):
    """Reference: bin/server.cpp — listens and serves sessions."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, host: str = "127.0.0.1", port: int = 5432,
                 catalog: Optional[Catalog] = None):
        super().__init__((host, port), _Handler)
        self.catalog = catalog if catalog is not None else default_catalog()

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=5432)
    p.add_argument("--tpch", type=float, default=None,
                   help="generate TPC-H tables at this scale factor")
    args = p.parse_args()
    if args.tpch:
        from hyrise_tpu.tpch.dbgen import load_into_catalog
        load_into_catalog(args.tpch)
    srv = Server(port=args.port)
    print(f"hyrise_tpu server listening on :{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
