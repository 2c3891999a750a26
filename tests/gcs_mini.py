"""Minimal in-process GCS emulator (fake-gcs-server-style) for contract
tests: the subset of the public JSON API `GcsFS` speaks — object
get/insert/delete, metadata GET, media GET (``?alt=media`` with the
``x-goog-generation`` header), Objects: list (prefix/delimiter/
pageToken JSON), Objects: rewrite (``/rewriteTo/``), and generation
preconditions (``ifGenerationMatch`` → 412, the documented CAS).

Auth is BEARER-ONLY and verified: GCS's service-account / workload-
identity grant is an OAuth2 access token, and the emulator accepts only
live tokens it issued (from ``issue_token`` or the GCE metadata-server
stub) — expired/unknown tokens get 401 like real GCS, so the client's
refresh-on-401 path is exercised against an independent server, not a
mock of itself.  The metadata stub speaks the documented endpoint
(``/computeMetadata/v1/instance/service-accounts/default/token`` with
``Metadata-Flavor: Google`` required, ``expires_in`` SECONDS — not the
epoch ``expires_on`` Azure's IMDS returns).
"""

from __future__ import annotations

import http.server
import json
import threading
import time
import uuid
from urllib.parse import parse_qsl, unquote, urlsplit


class _State:
    def __init__(self):
        #: (bucket, name) -> (data, generation, updated_rfc3339)
        self.objects: dict[tuple[str, str], tuple[bytes, int, str]] = {}
        self.lock = threading.Lock()
        #: issued OAuth tokens: token -> expiry epoch
        self.tokens: dict[str, float] = {}
        #: TTL the metadata stub grants (tests shrink it to force refresh)
        self.meta_ttl: float = 3600.0
        #: TTL the JWT-grant token endpoint mints (tests shrink it)
        self.grant_ttl: float = 3600.0
        #: registered service accounts: client_email -> public key
        #: (cryptography RSAPublicKey — the emulator verifies RS256
        #: assertions INDEPENDENTLY of the repo's pure-python signer)
        self.service_accounts: dict[str, object] = {}
        #: default list page size (tests shrink it to force pagination)
        self.page_size: int = 1000
        self._gen = 1000


def register_service_account(state: _State, endpoint: str,
                             email: str = "svc@test.iam.example.com"
                             ) -> dict:
    """Generate an RSA keypair, register its PUBLIC half with the
    emulator, and return the service-account JSON keyfile dict (the
    ``GOOGLE_APPLICATION_CREDENTIALS`` shape: ``client_email``,
    PKCS#8-PEM ``private_key``, ``token_uri`` at the emulator).  The
    keypair comes from ``cryptography`` so the signature check is an
    independent implementation, not the repo's signer verifying
    itself."""
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()).decode()
    state.service_accounts[email] = key.public_key()
    return {"type": "service_account", "client_email": email,
            "private_key": pem, "token_uri": f"{endpoint}/token"}


def issue_token(state: _State, ttl: float = 3600.0) -> str:
    """Mint a bearer token the emulator will accept for ``ttl`` seconds
    (negative ttl = already expired)."""
    token = f"gcs-test-{uuid.uuid4().hex}"
    state.tokens[token] = time.time() + ttl
    return token


def _obj_json(name: str, data: bytes, gen: int, updated: str) -> dict:
    return {"kind": "storage#object", "name": name,
            "generation": str(gen), "etag": f"CIn{gen}",
            "size": str(len(data)), "updated": updated}


def make_handler(state: _State):

    class Handler(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        # -- plumbing ----------------------------------------------------
        def _respond(self, code: int, payload: dict | bytes | None = None,
                     headers: dict | None = None):
            body = (payload if isinstance(payload, bytes)
                    else json.dumps(payload).encode()
                    if payload is not None else b"")
            self.send_response(code)
            if not isinstance(payload, bytes) and payload is not None:
                self.send_header("Content-Type", "application/json")
            for n, v in (headers or {}).items():
                self.send_header(n, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if self.command != "HEAD":
                self.wfile.write(body)

        def _error(self, code: int, reason: str):
            self._respond(code, {"error": {"code": code,
                                           "message": reason}})

        def _check_auth(self) -> bool:
            auth = self.headers.get("Authorization", "")
            if not auth.startswith("Bearer "):
                self._error(401, "missing bearer token")
                return False
            expiry = state.tokens.get(auth[len("Bearer "):])
            if expiry is None or expiry < time.time():
                # real GCS: invalid/expired OAuth2 token -> 401
                self._error(401, "Invalid Credentials")
                return False
            return True

        def _parse(self):
            parts = urlsplit(self.path)
            params = dict(parse_qsl(parts.query, keep_blank_values=True))
            return parts.path, params

        @staticmethod
        def _now() -> str:
            return time.strftime("%Y-%m-%dT%H:%M:%S.000Z", time.gmtime())

        def _put_object(self, bucket: str, name: str, data: bytes,
                        params: dict):
            with state.lock:
                existing = state.objects.get((bucket, name))
                cond = params.get("ifGenerationMatch")
                if cond is not None:
                    # the documented precondition contract: 0 means
                    # "only if absent"; a generation means "only if the
                    # live generation is exactly this" -> 412 otherwise
                    want = int(cond)
                    live = existing[1] if existing else 0
                    if want != live:
                        return self._error(412, "conditionNotMet")
                state._gen += 1
                updated = self._now()
                state.objects[(bucket, name)] = (data, state._gen,
                                                 updated)
                return self._respond(
                    200, _obj_json(name, data, state._gen, updated))

        # -- verbs -------------------------------------------------------
        def do_GET(self):
            path, params = self._parse()
            if path == ("/computeMetadata/v1/instance/service-accounts/"
                        "default/token"):
                # GCE metadata stub: requires Metadata-Flavor, returns
                # expires_in SECONDS (the real response shape)
                if self.headers.get("Metadata-Flavor") != "Google":
                    return self._error(403, "Metadata-Flavor missing")
                token = issue_token(state, state.meta_ttl or 3600.0)
                doc = {"access_token": token, "token_type": "Bearer"}
                # meta_ttl <= 0 simulates a metadata server that omits
                # expires_in (seen on some proxies) — the client must
                # treat that as "no known expiry", not "expired now"
                if state.meta_ttl > 0:
                    doc["expires_in"] = int(state.meta_ttl)
                return self._respond(200, doc)
            if not self._check_auth():
                return
            if not path.startswith("/storage/v1/b/"):
                return self._error(404, "unknown route")
            rest = path[len("/storage/v1/b/"):]
            bucket, _, tail = rest.partition("/")
            if tail == "o":                      # Objects: list
                return self._list(bucket, params)
            if not tail.startswith("o/"):
                return self._error(404, "unknown route")
            name = unquote(tail[len("o/"):])
            with state.lock:
                entry = state.objects.get((bucket, name))
            if entry is None:
                return self._error(404, "No such object")
            data, gen, updated = entry
            if params.get("alt") == "media":
                rng = self.headers.get("Range")
                if rng and rng.startswith("bytes="):
                    spec = rng[len("bytes="):]
                    if spec.startswith("-"):      # suffix range
                        n = int(spec[1:])
                        if len(data) == 0:
                            return self._error(416, "empty object")
                        return self._respond(
                            206, data[-n:],
                            {"x-goog-generation": str(gen)})
                    start_s, _, end_s = spec.partition("-")
                    start = int(start_s)
                    if start >= len(data):
                        return self._error(416, "range out of bounds")
                    end = min(int(end_s), len(data) - 1) if end_s \
                        else len(data) - 1
                    return self._respond(
                        206, data[start:end + 1],
                        {"x-goog-generation": str(gen)})
                return self._respond(200, data,
                                     {"x-goog-generation": str(gen)})
            return self._respond(200, _obj_json(name, data, gen, updated))

        def _jwt_grant(self, body: bytes):
            """OAuth2 token endpoint for the service-account JWT-bearer
            grant: verifies the RS256 assertion against the REGISTERED
            public key (via ``cryptography`` — an implementation
            independent of the client's pure-python signer), checks
            iss/aud/exp, and mints a live token.  Failures are 400
            ``invalid_grant`` like the real endpoint."""
            import base64

            from cryptography.exceptions import InvalidSignature
            from cryptography.hazmat.primitives import hashes
            from cryptography.hazmat.primitives.asymmetric import (
                padding)
            form = dict(parse_qsl(body.decode()))
            if form.get("grant_type") != \
                    "urn:ietf:params:oauth:grant-type:jwt-bearer":
                return self._error(400, "invalid_grant: grant_type")
            try:
                signing_input, _, sig_b64 = form["assertion"]\
                    .rpartition(".")
                hdr_b64, _, claims_b64 = signing_input.partition(".")

                def unb64(s: str) -> bytes:
                    return base64.urlsafe_b64decode(
                        s + "=" * (-len(s) % 4))
                header = json.loads(unb64(hdr_b64))
                claims = json.loads(unb64(claims_b64))
                sig = unb64(sig_b64)
            except Exception:
                return self._error(400, "invalid_grant: malformed JWT")
            if header.get("alg") != "RS256":
                return self._error(400, "invalid_grant: alg")
            pub = state.service_accounts.get(claims.get("iss", ""))
            if pub is None:
                return self._error(400, "invalid_grant: unknown iss")
            if not str(claims.get("aud", "")).endswith("/token"):
                return self._error(400, "invalid_grant: aud")
            if float(claims.get("exp", 0)) < time.time():
                return self._error(400, "invalid_grant: assertion "
                                        "expired")
            try:
                pub.verify(sig, signing_input.encode(),
                           padding.PKCS1v15(), hashes.SHA256())
            except InvalidSignature:
                return self._error(400, "invalid_grant: bad signature")
            token = issue_token(state, state.grant_ttl or 3600.0)
            doc = {"access_token": token, "token_type": "Bearer"}
            if state.grant_ttl > 0:
                doc["expires_in"] = int(state.grant_ttl)
            return self._respond(200, doc)

        def do_POST(self):
            path, params = self._parse()
            length = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(length) if length else b""
            if path == "/token":
                # the token endpoint is the one UNauthenticated route:
                # the assertion IS the credential
                return self._jwt_grant(body)
            if not self._check_auth():
                return
            if path.startswith("/upload/storage/v1/b/"):
                rest = path[len("/upload/storage/v1/b/"):]
                bucket, _, tail = rest.partition("/")
                if tail != "o" or params.get("uploadType") != "media" \
                        or "name" not in params:
                    return self._error(400, "bad upload request")
                return self._put_object(bucket, params["name"], body,
                                        params)
            if path.startswith("/storage/v1/b/") and "/rewriteTo/b/" \
                    in path:
                rest = path[len("/storage/v1/b/"):]
                sbucket, _, tail = rest.partition("/o/")
                src_enc, _, dst_part = tail.partition("/rewriteTo/b/")
                dbucket, _, dst_enc = dst_part.partition("/o/")
                src, dst = unquote(src_enc), unquote(dst_enc)
                with state.lock:
                    entry = state.objects.get((sbucket, src))
                    if entry is None:
                        return self._error(404, "No such object")
                    state._gen += 1
                    updated = self._now()
                    state.objects[(dbucket, dst)] = (entry[0],
                                                     state._gen, updated)
                return self._respond(200, {
                    "kind": "storage#rewriteResponse", "done": True,
                    "resource": _obj_json(dst, entry[0], state._gen,
                                          updated)})
            return self._error(404, "unknown route")

        def do_DELETE(self):
            path, params = self._parse()
            if not self._check_auth():
                return
            rest = path[len("/storage/v1/b/"):] \
                if path.startswith("/storage/v1/b/") else ""
            bucket, _, tail = rest.partition("/")
            if not tail.startswith("o/"):
                return self._error(404, "unknown route")
            name = unquote(tail[len("o/"):])
            with state.lock:
                if (bucket, name) not in state.objects:
                    return self._error(404, "No such object")
                del state.objects[(bucket, name)]
            self._respond(204)

        def _list(self, bucket: str, params: dict):
            prefix = params.get("prefix", "")
            delim = params.get("delimiter")
            max_results = int(params.get("maxResults", state.page_size))
            page_token = params.get("pageToken", "")
            with state.lock:
                names = sorted(n for b, n in state.objects
                               if b == bucket and n.startswith(prefix))
                entries = {n: state.objects[(bucket, n)] for n in names}
            items, prefixes = [], []
            for name in names:
                if delim:
                    tail = name[len(prefix):]
                    if delim in tail:
                        p = prefix + tail.split(delim)[0] + delim
                        if p not in prefixes:
                            prefixes.append(p)
                        continue
                items.append(name)
            # pageToken = last item name of the previous page (items
            # only — real GCS paginates prefixes too, but a page size
            # far above any test's object count keeps the stub honest)
            if page_token:
                items = [n for n in items if n > page_token]
            page, rest = items[:max_results], items[max_results:]
            out: dict = {"kind": "storage#objects"}
            if page:
                out["items"] = [_obj_json(n, *entries[n]) for n in page]
            if prefixes:
                out["prefixes"] = prefixes
            if rest:
                out["nextPageToken"] = page[-1]
            self._respond(200, out)

    return Handler


def start_server():
    """Start the emulator on an ephemeral port; returns
    ``(server, endpoint)`` — endpoint is the JSON-API root the client
    points ``GCS_JSON_ENDPOINT`` at (``http://127.0.0.1:port``)."""
    state = _State()
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(state))
    srv.state = state  # tests mint/expire bearer tokens through this
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"
