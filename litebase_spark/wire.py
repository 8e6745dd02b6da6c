"""Binary wire protocol for query streaming — reference-compatible framing.

The reference's `query/stream` endpoint speaks a length-prefixed binary
protocol, not NDJSON. This module reproduces it byte-for-byte:

  * message framing — [1B type][4B LE length][payload]
    (pkg/http/query_stream_controller.go:30-38 message types;
    readQueryStream:160-185 reads exactly this header);
  * query input encoding — [4B id_len][id][4B txid_len][txid]
    [4B stmt_len][stmt][4B params_len][params]
    (pkg/database/query_input.go `Decode`/`Encode`; note the field
    ORDER follows the code, the doc table at the top of that file is
    stale);
  * statement parameters — [1B column_type][4B value_len][value]
    with INTEGER as 8-byte LE two's complement, FLOAT as 8-byte LE
    IEEE-754, TEXT/BLOB raw bytes, NULL empty
    (pkg/sqlite3/parameter.go `DecodeStatementParameter`);
  * query response envelope v1 — [1B version][4B id_len][id]
    [4B txid_len][txid] then either [4B err_len][err] or
    [4B changes][8B latency f64][4B column_count][4B row_count]
    [4B last_insert_row_id][4B columns_len][per column: 4B len + name]
    [per row: 4B len + concatenated encoded column values]
    (pkg/database/query_response.go:15-50 table + `Encode`);
  * column values typed with the SQLite storage-class codes
    INTEGER=1 FLOAT=2 TEXT=3 BLOB=4 NULL=5
    (pkg/sqlite3/column.go:35-40, `Column.Encode`).

A frame (type 0x04) request payload holds one or more
[4B len][query input] entries; the response frame holds one
[FRAME_ENTRY|ERROR][4B len][query response] per query
(handleQueryStreamFrame). OPEN (0x01) answers with the literal payload
"connected" (handleQueryStreamConnection); CLOSE (0x02) ends the
stream.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

# pkg/http/query_stream_controller.go:30-38
MSG_OPEN = 0x01
MSG_CLOSE = 0x02
MSG_ERROR = 0x03
MSG_FRAME = 0x04
MSG_FRAME_ENTRY = 0x05

# pkg/sqlite3/column.go:35-40 (SQLite storage-class codes)
COL_INTEGER = 1
COL_FLOAT = 2
COL_TEXT = 3
COL_BLOB = 4
COL_NULL = 5

_U32 = struct.Struct("<I")
_I64 = struct.Struct("<q")
_F64 = struct.Struct("<d")


def _lp(data: bytes) -> bytes:
    """4-byte LE length prefix + data."""
    return _U32.pack(len(data)) + data


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("truncated wire data")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u32(self) -> int:
        return _U32.unpack(self.take(4))[0]

    def remaining(self) -> int:
        return len(self.data) - self.pos


# -- messages ----------------------------------------------------------------


def encode_message(mtype: int, payload: bytes) -> bytes:
    return bytes([mtype]) + _lp(payload)


def read_message(read) -> tuple[int, bytes] | None:
    """Read one [type][len][payload] message via `read(n)`; None on a
    clean EOF at a message boundary."""
    header = b""
    while len(header) < 5:
        chunk = read(5 - len(header))
        if not chunk:
            if header:
                raise ValueError("truncated message header")
            return None
        header += chunk
    mtype = header[0]
    length = _U32.unpack(header[1:5])[0]
    payload = b""
    while len(payload) < length:
        chunk = read(length - len(payload))
        if not chunk:
            raise ValueError("truncated message payload")
        payload += chunk
    return mtype, payload


# -- statement parameters ----------------------------------------------------


def encode_parameter(ptype: str, value) -> bytes:
    t = ptype.upper()
    if t == "INTEGER":
        return bytes([COL_INTEGER]) + _U32.pack(8) + _I64.pack(int(value))
    if t == "FLOAT":
        return bytes([COL_FLOAT]) + _U32.pack(8) + _F64.pack(float(value))
    if t == "TEXT":
        raw = value.encode() if isinstance(value, str) else bytes(value)
        return bytes([COL_TEXT]) + _lp(raw)
    if t == "BLOB":
        return bytes([COL_BLOB]) + _lp(bytes(value))
    if t == "NULL":
        return bytes([COL_NULL]) + _U32.pack(0)
    raise ValueError(f"unsupported parameter type: {ptype}")


def decode_parameter(r: _Reader) -> dict:
    ptype = r.take(1)[0]
    length = r.u32()
    if ptype == COL_INTEGER:
        return {"type": "INTEGER", "value": _I64.unpack(r.take(8))[0]}
    if ptype == COL_FLOAT:
        return {"type": "FLOAT", "value": _F64.unpack(r.take(8))[0]}
    if ptype == COL_TEXT:
        return {"type": "TEXT", "value": r.take(length).decode()}
    if ptype == COL_BLOB:
        return {"type": "BLOB", "value": r.take(length)}
    if ptype == COL_NULL:
        return {"type": "NULL", "value": None}
    return {"type": "UNKNOWN", "value": r.take(length)}


# -- query input -------------------------------------------------------------


def encode_query_input(
    qid: str,
    statement: str,
    parameters: list[dict] | None = None,
    transaction_id: str = "",
) -> bytes:
    params = b"".join(
        encode_parameter(p["type"], p.get("value"))
        for p in (parameters or [])
    )
    return (
        _lp(qid.encode())
        + _lp(transaction_id.encode())
        + _lp(statement.encode())
        + _lp(params)
    )


def decode_query_input(data: bytes) -> dict:
    r = _Reader(data)
    qid = r.take(r.u32()).decode()
    txid = r.take(r.u32()).decode()
    stmt = r.take(r.u32()).decode()
    pr = _Reader(r.take(r.u32()))
    params = []
    while pr.remaining() > 0:
        params.append(decode_parameter(pr))
    return {
        "id": qid,
        "transaction_id": txid,
        "statement": stmt,
        "parameters": params,
    }


def encode_frame_payload(queries: list[bytes]) -> bytes:
    """Request FRAME payload: [4B len][query input] per query."""
    return b"".join(_lp(q) for q in queries)


def iter_frame_queries(payload: bytes):
    r = _Reader(payload)
    while r.remaining() >= 4:
        n = r.u32()
        if r.remaining() < n:
            break
        yield r.take(n)


# -- column values -----------------------------------------------------------


def encode_value(v) -> bytes:
    if v is None:
        return bytes([COL_NULL]) + _U32.pack(0)
    if isinstance(v, bool):
        return bytes([COL_INTEGER]) + _U32.pack(8) + _I64.pack(int(v))
    if isinstance(v, int):
        return bytes([COL_INTEGER]) + _U32.pack(8) + _I64.pack(v)
    if isinstance(v, float):
        return bytes([COL_FLOAT]) + _U32.pack(8) + _F64.pack(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes([COL_BLOB]) + _lp(bytes(v))
    if isinstance(v, str):
        return bytes([COL_TEXT]) + _lp(v.encode())
    # datetimes, Decimals, arrays: collapse through the JSON value
    # mapping the batch endpoint uses, then land as TEXT/FLOAT
    import datetime as _dt
    import decimal as _decimal
    import json as _json

    if isinstance(v, (_dt.datetime, _dt.date)):
        return encode_value(v.isoformat())
    if isinstance(v, _decimal.Decimal):
        return encode_value(float(v))
    return encode_value(_json.dumps(v, default=str))


def decode_value(r: _Reader):
    ctype = r.take(1)[0]
    length = r.u32()
    if ctype == COL_INTEGER:
        return _I64.unpack(r.take(8))[0]
    if ctype == COL_FLOAT:
        return _F64.unpack(r.take(8))[0]
    if ctype == COL_TEXT:
        return r.take(length).decode()
    if ctype == COL_BLOB:
        return r.take(length)
    if ctype == COL_NULL:
        return None
    return r.take(length)


# -- query response envelope (version 1) -------------------------------------


@dataclass
class WireResponse:
    id: str = ""
    transaction_id: str = ""
    error: str = ""
    changes: int = 0
    latency: float = 0.0
    row_count: int = 0
    last_insert_row_id: int = 0
    columns: list[str] = field(default_factory=list)
    rows: list[list] = field(default_factory=list)


def encode_query_response(resp: WireResponse) -> bytes:
    out = [
        bytes([1]),  # version
        _lp(resp.id.encode()),
        _lp(resp.transaction_id.encode()),
    ]
    if resp.error:
        out.append(_lp(resp.error.encode()))
        return b"".join(out)
    out.append(_U32.pack(max(0, resp.changes or 0)))
    out.append(_F64.pack(resp.latency))
    out.append(_U32.pack(len(resp.columns)))
    out.append(_U32.pack(resp.row_count))
    out.append(_U32.pack(max(0, resp.last_insert_row_id)))
    cols = b"".join(_lp(c.encode()) for c in resp.columns)
    out.append(_U32.pack(len(cols)))
    out.append(cols)
    for row in resp.rows:
        rowdata = b"".join(encode_value(v) for v in row)
        out.append(_lp(rowdata))
    return b"".join(out)


def decode_query_response(data: bytes, is_error: bool = False) -> WireResponse:
    r = _Reader(data)
    version = r.take(1)[0]
    if version != 1:
        raise ValueError(f"unsupported response version {version}")
    resp = WireResponse()
    resp.id = r.take(r.u32()).decode()
    resp.transaction_id = r.take(r.u32()).decode()
    if is_error:
        resp.error = r.take(r.u32()).decode()
        return resp
    resp.changes = r.u32()
    resp.latency = _F64.unpack(r.take(8))[0]
    n_cols = r.u32()
    resp.row_count = r.u32()
    resp.last_insert_row_id = r.u32()
    cols_len = r.u32()
    cr = _Reader(r.take(cols_len))
    for _ in range(n_cols):
        resp.columns.append(cr.take(cr.u32()).decode())
    while r.remaining() >= 4:
        rowdata = _Reader(r.take(r.u32()))
        row = []
        while rowdata.remaining() > 0:
            row.append(decode_value(rowdata))
        resp.rows.append(row)
    return resp


def iter_frame_entries(payload: bytes):
    """Yield (entry_type, response_bytes) from a response FRAME payload."""
    r = _Reader(payload)
    while r.remaining() >= 5:
        etype = r.take(1)[0]
        n = r.u32()
        yield etype, r.take(n)


# -- minimal raw-socket client (tests / CLI) ---------------------------------


class BinaryStreamClient:
    """Speaks the protocol over one streamed HTTP request (the server
    reads messages from the request body and writes frames to the
    response body as they complete — same duplex shape as the
    reference's EnableFullDuplex controller)."""

    def __init__(self, host: str, port: int, path: str, auth: str) -> None:
        import socket

        self.sock = socket.create_connection((host, port), timeout=30)
        req = (
            f"POST {path} HTTP/1.1\r\n"
            f"Host: {host}:{port}\r\n"
            f"Authorization: {auth}\r\n"
            "Content-Type: application/octet-stream\r\n"
            "Connection: close\r\n"
            "\r\n"
        )
        self.sock.sendall(req.encode())
        self._buf = b""
        self._headers_done = False

    def _read(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                break
            self._buf += chunk
            if not self._headers_done:
                idx = self._buf.find(b"\r\n\r\n")
                if idx >= 0:
                    self.status = int(self._buf.split(b" ", 2)[1])
                    self._buf = self._buf[idx + 4 :]
                    self._headers_done = True
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def send_message(self, mtype: int, payload: bytes = b"") -> None:
        self.sock.sendall(encode_message(mtype, payload))

    def _ensure_headers(self) -> None:
        """Block until the response status line + headers are consumed,
        then reject non-200: on 401/403 the server answers with a JSON
        error body, not wire frames — surface the auth failure instead
        of a confusing frame-parse error."""
        while not self._headers_done:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("connection closed before headers")
            self._buf += chunk
            idx = self._buf.find(b"\r\n\r\n")
            if idx >= 0:
                self.status = int(self._buf.split(b" ", 2)[1])
                self._buf = self._buf[idx + 4 :]
                self._headers_done = True
        if self.status != 200:
            raise ConnectionError(
                f"stream open failed: HTTP {self.status}"
            )

    def read_message(self) -> tuple[int, bytes] | None:
        self._ensure_headers()
        return read_message(self._read)

    def open(self) -> bytes:
        self.send_message(MSG_OPEN)
        m = self.read_message()
        if m is None or m[0] != MSG_OPEN:
            raise ConnectionError(f"bad open reply: {m!r}")
        return m[1]

    def query(
        self,
        qid: str,
        statement: str,
        parameters: list[dict] | None = None,
        transaction_id: str = "",
    ) -> WireResponse:
        q = encode_query_input(qid, statement, parameters, transaction_id)
        self.send_message(MSG_FRAME, encode_frame_payload([q]))
        m = self.read_message()
        if m is None:
            raise ConnectionError("stream closed")
        mtype, payload = m
        if mtype == MSG_ERROR:
            resp = WireResponse()
            resp.error = payload.decode()
            return resp
        entries = list(iter_frame_entries(payload))
        etype, data = entries[0]
        return decode_query_response(data, is_error=(etype == MSG_ERROR))

    def close(self) -> None:
        try:
            self.send_message(MSG_CLOSE)
        except OSError:
            pass
        self.sock.close()
