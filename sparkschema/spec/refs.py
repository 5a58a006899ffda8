"""$ref resolution: registry, $id scope algebra, JSON-pointer walking.

Re-expresses the semantics of the reference's largest subsystem
(reference: internal/refs/SchemaRefResolver.scala, internal/refs/Ref.scala,
internal/refs/SchemaResolutionScope.scala — ~550 LoC) without porting its
architecture:

- refs classify as local (``#...``), relative, or absolute
  (Ref.scala:124-143);
- ``id`` (draft-4) / ``$id`` (draft-7) rebase the resolution scope via URL
  join (SchemaRefResolver.scala:42-49, Ref.scala:20-89) — here
  ``urllib.parse.urljoin``;
- JSON-pointer fragments unescape ``~0``→``~``, ``~1``→``/`` and are
  URL-decoded (SchemaRefResolver.scala:264-275);
- resolution is depth-capped (MaxDepth=100 → ``err.max.depth``,
  SchemaRefResolver.scala:32,67);
- remote *network* fetch is intentionally unsupported: all documents must
  be pre-registered (the ``SchemaValidator.addSchema`` analog,
  SchemaValidator.scala:84-92). Executors never touch the network.

Everything here is driver-side / pure Python; the compiled artifacts
shipped to executors contain only resolved schema dicts.
"""

from __future__ import annotations

from typing import Any
from urllib.parse import unquote, urldefrag, urljoin

MAX_DEPTH = 100


class RefError(Exception):
    """Unresolvable ref / depth overflow; carries the catalog key."""

    def __init__(self, msg_key: str, *args: object):
        super().__init__(msg_key, *args)
        self.msg_key = msg_key
        self.args_ = args


def _id_of(schema: Any, dialect: str) -> str | None:
    if not isinstance(schema, dict):
        return None
    key = "$id" if dialect == "draft7" else "id"
    v = schema.get(key)
    # be permissive: accept both spellings regardless of dialect (the
    # reference's draft-7 reads also accept legacy ids in ajv fixtures)
    if v is None:
        v = schema.get("$id") or schema.get("id")
    return v if isinstance(v, str) and v else None


def unescape_pointer_token(tok: str) -> str:
    """JSON-pointer token unescape: URL %-decode then ~1 → / and ~0 → ~."""
    return unquote(tok).replace("~1", "/").replace("~0", "~")


def walk_pointer(doc: Any, pointer: str) -> Any:
    """Walk a JSON pointer (no leading '#') through raw dicts/lists.

    Raises :class:`RefError` (``err.unresolved.ref``) when a step is
    missing. Steps into array indices and plain constraint values alike
    (the reference's resolveSchema knows constraint paths such as
    ``#/properties/x/minimum`` — SchemaRefResolver.scala:308-381).
    """
    cur = doc
    if pointer in ("", "/"):
        return cur
    for raw in pointer.lstrip("/").split("/"):
        tok = unescape_pointer_token(raw)
        if isinstance(cur, dict):
            if tok not in cur:
                raise RefError("err.unresolved.ref", "#/" + pointer.lstrip("/"))
            cur = cur[tok]
        elif isinstance(cur, list):
            try:
                idx = int(tok)
            except ValueError:
                raise RefError("arr.invalid.index", tok) from None
            if not (0 <= idx < len(cur)):
                raise RefError("arr.out.of.bounds", idx)
            cur = cur[idx]
        else:
            raise RefError("err.unresolved.ref", "#/" + pointer.lstrip("/"))
    return cur


class Scope:
    """Resolution scope: current document root + absolute base URI.

    The analog of the reference's ``SchemaResolutionScope``
    (internal/refs/SchemaResolutionScope.scala:7-18) minus instance-path
    bookkeeping (violation paths are threaded by the validator itself).
    """

    __slots__ = ("root", "base", "referrer", "has_id")

    def __init__(self, root: Any, base: str = "", referrer: str | None = None,
                 has_id: bool = False):
        self.root = root
        self.base = base
        # error-report metadata (Results.scala:42-43): referrer = schema
        # path of the $ref that led here; has_id = an explicit id/$id set
        # this base (the reference only reports resolutionScope then)
        self.referrer = referrer
        self.has_id = has_id

    def refine(self, schema: Any, dialect: str) -> "Scope":
        """Rebase the scope when entering an ``id``/``$id``-bearing node."""
        sid = _id_of(schema, dialect)
        if sid is None:
            return self
        return Scope(self.root, urljoin(self.base, sid) if self.base else sid,
                     self.referrer, has_id=True)

    def with_referrer(self, referrer: str) -> "Scope":
        return Scope(self.root, self.base, referrer, self.has_id)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Scope(base={self.base!r})"


class DocumentIndex:
    """URI → (subschema, enclosing document) index.

    Built by walking every registered document and harvesting each
    ``id``/``$id``-bearing subschema under its absolute URI — the analog of
    the reference's ``collectSchemas`` (internal/package.scala:24-48) +
    ``DocumentCache``.
    """

    def __init__(self) -> None:
        self._by_uri: dict[str, tuple[Any, Any]] = {}

    def add_document(self, uri: str, schema: Any, dialect: str) -> None:
        uri_nofrag, frag = urldefrag(uri)
        key = uri_nofrag or uri
        self._by_uri[key] = (schema, schema)
        self._collect(schema, Scope(schema, key), dialect, root=schema)

    def _collect(self, node: Any, scope: Scope, dialect: str, root: Any) -> None:
        if isinstance(node, dict):
            new_scope = scope.refine(node, dialect)
            if new_scope is not scope and new_scope.base:
                self._by_uri.setdefault(new_scope.base, (node, root))
            for k, v in node.items():
                if k in ("enum", "const", "default", "examples"):
                    continue  # literal payloads, not subschemas
                self._collect(v, new_scope, dialect, root)
        elif isinstance(node, list):
            for v in node:
                self._collect(v, scope, dialect, root)

    def lookup(self, uri: str) -> tuple[Any, Any] | None:
        return self._by_uri.get(uri)

    def clone(self) -> "DocumentIndex":
        """Shallow copy — compile-time ref inlining registers the
        TRANSIENT root spec into an index; cloning first keeps that
        registration (and its $id scopes, which ``_collect`` only
        ``setdefault``s) out of the caller's long-lived registry, where
        a stale subschema could shadow a later document with the same
        $id."""
        new = DocumentIndex()
        new._by_uri = dict(self._by_uri)
        return new


class RefResolver:
    """Resolve a ``$ref`` string against a scope, chasing ref-to-ref chains.

    Mirrors the observable behavior of the reference's recursive
    ``resolve`` (SchemaRefResolver.scala:61-113): scope updates on entry,
    cache/registry hits, fragment-pointer walking, depth cap.
    """

    def __init__(self, index: DocumentIndex, dialect: str = "draft7"):
        self.index = index
        self.dialect = dialect

    def resolve(self, ref: str, scope: Scope, _depth: int = 0) -> tuple[Any, Scope]:
        if _depth > MAX_DEPTH:
            raise RefError("err.max.depth")
        if not isinstance(ref, str) or ref == "":
            raise RefError("err.unresolved.ref", ref)

        target = urljoin(scope.base, ref) if scope.base else ref
        doc_uri, frag = urldefrag(target)

        # 1. locate the document (or anchor-style id)
        if doc_uri and doc_uri != urldefrag(scope.base)[0]:
            hit = self.index.lookup(doc_uri)
            if hit is None and frag:
                # anchor-style ids registered with their fragment
                hit2 = self.index.lookup(target)
                if hit2 is not None:
                    return self._chase(hit2[0], Scope(hit2[1], target), _depth)
            if hit is None:
                raise RefError("err.unresolved.ref", ref)
            doc, root = hit
            doc_scope = Scope(root, doc_uri)
        else:
            # same-document ref; a relative-id anchor hit (e.g. a subschema
            # registered under id "layout" — ajv 27_recursive_reference)
            # must land on the *subschema*, not the document root
            hit = self.index.lookup(doc_uri) if doc_uri else None
            if hit is not None:
                doc, root = hit
                doc_scope = Scope(root, doc_uri)
            else:
                doc = scope.root
                doc_scope = Scope(scope.root, doc_uri or scope.base)

        # 2. walk the fragment
        if not frag:
            node = doc
        elif frag.startswith("/"):
            # ids on nodes *along* the pointer path rebase the scope
            # (refRemote.json "base URI change - change folder in subschema")
            cur = doc
            try:
                for raw in frag.lstrip("/").split("/"):
                    if isinstance(cur, dict):
                        doc_scope = doc_scope.refine(cur, self.dialect)
                    cur = walk_pointer(cur, "/" + raw)
            except RefError:
                # report the caller's full ref, not the failing step
                raise RefError("err.unresolved.ref", ref) from None
            node = cur
        else:
            # anchor-style fragment ("#foo"): look up collected id
            base_nofrag = urldefrag(doc_scope.base)[0]
            hit = self.index.lookup(f"{base_nofrag}#{frag}") or self.index.lookup(f"#{frag}")
            if hit is None:
                raise RefError("err.unresolved.ref", ref)
            node, root = hit
            doc_scope = Scope(root, f"{base_nofrag}#{frag}")

        return self._chase(node, doc_scope, _depth)

    def _chase(self, node: Any, scope: Scope, depth: int) -> tuple[Any, Scope]:
        """Follow ref-to-ref chains.

        Scope is refined only when chasing onward — a returned node keeps
        the *unrefined* scope so the validator applies its ``id``/``$id``
        exactly once (a relative id like ``"folder/"`` must not be joined
        twice; exercised by refRemote.json "base URI change - change
        folder")."""
        if isinstance(node, dict):
            nxt = node.get("$ref")
            if isinstance(nxt, str) and set(node.keys()) <= {"$ref", "id", "$id"}:
                return self.resolve(nxt, scope.refine(node, self.dialect), depth + 1)
        return node, scope
