"""Minimal in-process Azure Blob emulator (Azurite-style) for contract
tests: the subset of the public Blob REST API `AzureBlobFS` speaks —
Put/Get/Head/Delete Blob, Copy Blob (``x-ms-copy-source``), List Blobs
(``restype=container&comp=list`` with prefix/delimiter XML), conditional
PUT (``If-Match`` / ``If-None-Match: *``), per-blob ETags.

SharedKey auth is VERIFIED: the handler recomputes the canonical
string-to-sign from the raw request (an independent implementation of
the documented algorithm, not an import of the client's signer) and
rejects mismatches with 403 — so a client-side canonicalization bug
fails tests here instead of only against real Azure.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import http.server
import threading
import uuid
from urllib.parse import parse_qsl, unquote, urlsplit
from xml.sax.saxutils import escape

ACCOUNT = "devstoreaccount1"
KEY_B64 = base64.b64encode(b"azurite-mini-test-key-0123456789").decode()


class _State:
    def __init__(self):
        self.blobs: dict[tuple[str, str], tuple[bytes, str]] = {}
        self.lock = threading.Lock()
        #: issued OAuth tokens: token -> expiry epoch (the emulator's
        #: AAD: tokens come from the IMDS stub or issue_token())
        self.tokens: dict[str, float] = {}
        #: TTL the IMDS stub grants (tests shrink it to force refresh)
        self.imds_ttl: float = 3600.0


def issue_token(state: _State, ttl: float = 3600.0) -> str:
    """Mint a bearer token the emulator will accept for ``ttl``
    seconds (negative ttl = already expired)."""
    import time
    token = f"zc-test-{uuid.uuid4().hex}"
    state.tokens[token] = time.time() + ttl
    return token


def _sign(key: bytes, method: str, account: str, container: str,
          blob: str, params: dict, headers: dict,
          content_length: str) -> str:
    std = [headers.get("Content-Encoding", ""),
           headers.get("Content-Language", ""),
           content_length,
           headers.get("Content-MD5", ""),
           headers.get("Content-Type", ""),
           "",
           headers.get("If-Modified-Since", ""),
           headers.get("If-Match", ""),
           headers.get("If-None-Match", ""),
           headers.get("If-Unmodified-Since", ""),
           headers.get("Range", "")]
    canon_headers = "".join(
        f"{n}:{v}\n" for n, v in sorted(
            (n.lower(), v.strip()) for n, v in headers.items()
            if n.lower().startswith("x-ms-")))
    resource = f"/{account}/{container}"
    if blob:
        resource += f"/{blob}"
    canon_resource = resource + "".join(
        f"\n{n.lower()}:{v}" for n, v in sorted(params.items()))
    to_sign = "\n".join([method] + std) + "\n" \
        + canon_headers + canon_resource
    return base64.b64encode(
        hmac.new(key, to_sign.encode(), hashlib.sha256).digest()).decode()


def make_handler(state: _State):
    key = base64.b64decode(KEY_B64)

    class Handler(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        # -- plumbing ---------------------------------------------------
        def _parse(self):
            parts = urlsplit(self.path)
            params = dict(parse_qsl(parts.query, keep_blank_values=True))
            segs = unquote(parts.path).lstrip("/").split("/", 2)
            account = segs[0] if segs else ""
            container = segs[1] if len(segs) > 1 else ""
            blob = segs[2] if len(segs) > 2 else ""
            return account, container, blob, params

        def _reject(self, code: int, azcode: str):
            body = (f'<?xml version="1.0"?><Error><Code>{azcode}'
                    f'</Code></Error>').encode()
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _check_sas(self, account, container, params) -> bool:
            """Verify a SERVICE SAS (sr=c) — independent replay of the
            documented 16-field string-to-sign — plus expiry and the
            per-verb permission letter (r=GET/HEAD, w/c=PUT, d=DELETE,
            l=List).  Anything off → 403, like real Azure."""
            import datetime
            sv = params.get("sv", "")
            sp = params.get("sp", "")
            se = params.get("se", "")
            if params.get("sr") != "c":
                return self._reject(403, "AuthenticationFailed") or False
            resource = f"/blob/{account}/{container}"
            to_sign = "\n".join([sp, params.get("st", ""), se, resource,
                                 "", "", "", sv, "c", "", "",
                                 "", "", "", "", ""])
            want = base64.b64encode(hmac.new(
                key, to_sign.encode(), hashlib.sha256).digest()).decode()
            if params.get("sig") != want:
                return self._reject(403, "AuthenticationFailed") or False
            try:
                exp = datetime.datetime.fromisoformat(
                    se.replace("Z", "+00:00"))
            except ValueError:
                return self._reject(403, "AuthenticationFailed") or False
            if exp < datetime.datetime.now(datetime.timezone.utc):
                return self._reject(403, "AuthenticationFailed") or False
            needed = ("l" if params.get("comp") == "list"
                      else "d" if self.command == "DELETE"
                      else "wc" if self.command == "PUT"
                      else "r")
            if not any(ch in sp for ch in needed):
                return self._reject(403, "AuthorizationPermission"
                                    "Mismatch") or False
            return True

        def _check_auth(self, account, container, blob, params,
                        body_len: int) -> bool:
            auth = self.headers.get("Authorization", "")
            if not auth and "sig" in params:
                return self._check_sas(account, container, params)
            if auth.startswith("Bearer "):
                # AAD/MSI mode: the token must have been issued by the
                # IMDS stub (or issue_token) and still be live — real
                # Azure answers expired/unknown bearer tokens with 401
                # InvalidAuthenticationInfo, not 403
                import time
                expiry = state.tokens.get(auth[len("Bearer "):])
                if expiry is None or expiry < time.time():
                    self._reject(401, "InvalidAuthenticationInfo")
                    return False
                return True
            want_prefix = f"SharedKey {account}:"
            if not auth.startswith(want_prefix):
                self._reject(403, "AuthenticationFailed")
                return False
            length = str(body_len) if body_len else ""
            # real Azure canonicalizes the percent-ENCODED URI path as
            # sent on the wire — verify against the RAW path segments
            # (no unquote), so a client that signs the decoded key
            # fails here the same way it would against Azure
            raw = urlsplit(self.path).path.lstrip("/").split("/", 2)
            raw_container = raw[1] if len(raw) > 1 else ""
            raw_blob = raw[2] if len(raw) > 2 else ""
            expect = _sign(key, self.command, account, raw_container,
                           raw_blob, params, dict(self.headers.items()),
                           length)
            if auth[len(want_prefix):] != expect:
                self._reject(403, "AuthenticationFailed")
                return False
            return True

        def _respond(self, code: int, headers: dict | None = None,
                     body: bytes = b""):
            self.send_response(code)
            for n, v in (headers or {}).items():
                self.send_header(n, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if self.command != "HEAD":
                self.wfile.write(body)

        # -- verbs ------------------------------------------------------
        def do_PUT(self):
            account, container, blob, params = self._parse()
            length = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(length) if length else b""
            if not self._check_auth(account, container, blob, params,
                                    length):
                return
            src = self.headers.get("x-ms-copy-source")
            with state.lock:
                existing = state.blobs.get((container, blob))
                if self.headers.get("If-None-Match") == "*" and existing:
                    return self._reject(409, "BlobAlreadyExists")
                cond = self.headers.get("If-Match")
                if cond and (existing is None or existing[1] != cond):
                    return self._reject(412, "ConditionNotMet")
                if src:
                    sparts = urlsplit(src)
                    ssegs = unquote(sparts.path).lstrip("/").split("/", 2)
                    skey = (ssegs[1], ssegs[2]) if len(ssegs) > 2 \
                        else (None, None)
                    if skey not in state.blobs:
                        return self._reject(404, "BlobNotFound")
                    body = state.blobs[skey][0]
                etag = f'"0x{uuid.uuid4().hex[:16].upper()}"'
                state.blobs[(container, blob)] = (body, etag)
            hdrs = {"ETag": etag}
            if src:
                hdrs["x-ms-copy-status"] = "success"
            self._respond(201, hdrs)

        def do_GET(self):
            if self.path.startswith("/metadata/identity/oauth2/token"):
                # IMDS stub (the documented managed-identity endpoint):
                # requires the Metadata header, mints a state-tracked
                # token with the configured TTL
                import json as _json
                import time
                if self.headers.get("Metadata", "").lower() != "true":
                    return self._reject(400, "MissingMetadataHeader")
                token = issue_token(state, state.imds_ttl)
                body = _json.dumps({
                    "access_token": token,
                    "expires_on": str(int(state.tokens[token])),
                    "token_type": "Bearer"}).encode()
                return self._respond(
                    200, {"Content-Type": "application/json"}, body)
            account, container, blob, params = self._parse()
            if not self._check_auth(account, container, blob, params, 0):
                return
            if params.get("comp") == "list":
                return self._list(container, params)
            with state.lock:
                entry = state.blobs.get((container, blob))
            if entry is None:
                return self._reject(404, "BlobNotFound")
            data, etag = entry
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                spec = rng[len("bytes="):]
                if spec.startswith("-"):        # suffix range
                    n = int(spec[1:])
                    if len(data) == 0:
                        return self._reject(416, "InvalidRange")
                    return self._respond(206, {"ETag": etag},
                                         data[-n:])
                start_s, _, end_s = spec.partition("-")
                start = int(start_s)
                if start >= len(data):
                    return self._reject(416, "InvalidRange")
                end = min(int(end_s), len(data) - 1) if end_s \
                    else len(data) - 1
                return self._respond(206, {"ETag": etag},
                                     data[start:end + 1])
            self._respond(200, {"ETag": etag}, data)

        def do_HEAD(self):
            account, container, blob, params = self._parse()
            if not self._check_auth(account, container, blob, params, 0):
                return
            with state.lock:
                entry = state.blobs.get((container, blob))
            if entry is None:
                return self._respond(404)
            data, etag = entry
            self._respond(200, {"ETag": etag,
                                "x-ms-blob-type": "BlockBlob"}, data)

        def do_DELETE(self):
            account, container, blob, params = self._parse()
            if not self._check_auth(account, container, blob, params, 0):
                return
            with state.lock:
                if (container, blob) not in state.blobs:
                    return self._reject(404, "BlobNotFound")
                del state.blobs[(container, blob)]
            self._respond(202)

        def _list(self, container: str, params: dict):
            prefix = params.get("prefix", "")
            delim = params.get("delimiter")
            with state.lock:
                names = sorted(n for c, n in state.blobs
                               if c == container
                               and n.startswith(prefix))
                entries = {n: state.blobs[(container, n)]
                           for n in names}
            blobs_xml, prefixes = [], []
            for name in names:
                if delim:
                    rest = name[len(prefix):]
                    if delim in rest:
                        p = prefix + rest.split(delim)[0] + delim
                        if p not in prefixes:
                            prefixes.append(p)
                        continue
                data, etag = entries[name]
                blobs_xml.append(
                    f"<Blob><Name>{escape(name)}</Name><Properties>"
                    f"<Etag>{escape(etag)}</Etag>"
                    f"<Content-Length>{len(data)}</Content-Length>"
                    f"</Properties></Blob>")
            pre_xml = "".join(f"<BlobPrefix><Name>{escape(p)}</Name>"
                              f"</BlobPrefix>" for p in prefixes)
            body = (f'<?xml version="1.0" encoding="utf-8"?>'
                    f"<EnumerationResults><Blobs>"
                    f"{''.join(blobs_xml)}{pre_xml}</Blobs>"
                    f"<NextMarker/></EnumerationResults>").encode()
            self._respond(200, {"Content-Type": "application/xml"}, body)

    return Handler


def start_server():
    """Start the emulator on an ephemeral port; returns
    ``(server, endpoint)`` where endpoint is Azurite path-style
    (``http://127.0.0.1:port/devstoreaccount1``)."""
    state = _State()
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(state))
    srv.state = state  # tests mint/expire bearer tokens through this
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    endpoint = f"http://127.0.0.1:{srv.server_address[1]}/{ACCOUNT}"
    return srv, endpoint
