"""JSON Schema draft-4 registry and $ref resolution.

Re-implements, from the public draft-4 specs (json-schema-core
draft-zyp-04 §7, json-schema-validation draft-fge-00), the resolution
semantics the reference validator (playlyfe/themis, src/themis.js) exposes:
multiple schemas registered up-front by ``id``, JSON-Pointer fragments,
draft-4 inline ``id`` base-URI scoping ("location-independent
identifiers"), and cycle-safe resolution (cycles are legal and resolved
lazily; the compiler handles recursion, see pyvalidator.py).

No network: unlike ``refRemote``, every referenced schema must be
registered before compilation — same contract as the reference.
"""

from __future__ import annotations

import urllib.parse
from typing import Any


class SchemaResolutionError(Exception):
    """A $ref could not be resolved against the registry."""


def _unescape_pointer_token(token: str) -> str:
    # JSON Pointer escaping (RFC 6901) plus URI %-escapes.
    return urllib.parse.unquote(token).replace("~1", "/").replace("~0", "~")


def _walk_pointer(doc: Any, pointer: str) -> Any:
    """Follow a JSON Pointer ('' or '/a/0/b~1c') through a parsed schema."""
    node = doc
    if pointer in ("", "/"):
        return node
    for raw in pointer.lstrip("/").split("/"):
        token = _unescape_pointer_token(raw)
        if isinstance(node, dict):
            if token not in node:
                raise SchemaResolutionError(f"pointer token {token!r} not found")
            node = node[token]
        elif isinstance(node, list):
            try:
                node = node[int(token)]
            except (ValueError, IndexError) as exc:
                raise SchemaResolutionError(f"bad array index {token!r}") from exc
        else:
            raise SchemaResolutionError(f"cannot index scalar with {token!r}")
    return node


class SchemaRegistry:
    """Holds registered schemas and resolves $ref targets.

    Mirrors the reference's ``Themis.validator([s1, s2, ...])`` multi-schema
    registration: explicit draft-4 ``id`` wins, otherwise the registration
    index (as a string) names the schema.
    """

    def __init__(self) -> None:
        self.schemas: dict[str, Any] = {}  # document URI -> schema document
        # absolute URI (including inline '#frag' ids, resolved against the
        # enclosing base) -> (subschema, its base URI)
        self._id_index: dict[str, tuple[Any, str]] = {}

    def add(self, schema: Any, uri: str | None = None) -> str:
        if uri is None:
            declared = schema.get("id") if isinstance(schema, dict) else None
            if not (isinstance(declared, str) and declared):
                # anonymous re-registration must be idempotent: compiling
                # a table plan against a shared registry re-adds the root
                # schema, and a fresh counter uri would shift its
                # schema_path prefix vs the single-document path
                for known_uri, known in self.schemas.items():
                    if known is schema:
                        return known_uri
            uri = declared if isinstance(declared, str) and declared else str(len(self.schemas))
        doc_uri = uri.split("#", 1)[0] or uri
        self.schemas[doc_uri] = schema
        self._index_ids(schema, doc_uri)
        return doc_uri

    def _index_ids(self, node: Any, base: str) -> None:
        """Walk a schema, registering every inline draft-4 ``id`` scope."""
        if isinstance(node, dict):
            declared = node.get("id")
            if isinstance(declared, str) and declared:
                base = urllib.parse.urljoin(base, declared)
                self._id_index[base] = (node, base)
            for v in node.values():
                self._index_ids(v, base)
        elif isinstance(node, list):
            for v in node:
                self._index_ids(v, base)

    def resolve(self, ref: str, base_uri: str) -> tuple[Any, str, str]:
        """Resolve ``ref`` against ``base_uri``.

        Returns (subschema, new_base_uri, canonical_schema_path) where
        canonical_schema_path is '<doc_uri>#<fragment>' for violation rows.
        """
        target = urllib.parse.urljoin(base_uri, ref) if base_uri else ref
        doc_uri, _, fragment = target.partition("#")

        # Location-independent identifiers and inline id scopes first.
        if target in self._id_index:
            sub, new_base = self._id_index[target]
            return sub, new_base, target
        if not fragment.startswith("/") and fragment:
            # plain-name fragment like '#foo' — must come from the id index
            raise SchemaResolutionError(f"unresolvable plain-name fragment {target!r}")

        if doc_uri in self.schemas:
            doc = self.schemas[doc_uri]
        elif not doc_uri and base_uri.split("#", 1)[0] in self.schemas:
            doc_uri = base_uri.split("#", 1)[0]
            doc = self.schemas[doc_uri]
        else:
            raise SchemaResolutionError(f"schema document {doc_uri!r} not registered")

        sub = _walk_pointer(doc, fragment)
        new_base = doc_uri
        # Descending through the pointer may cross inline id scopes; re-derive
        # the base by replaying the pointer and applying ids along the way.
        if fragment:
            node = doc
            scope = doc_uri
            for raw in fragment.lstrip("/").split("/"):
                token = _unescape_pointer_token(raw)
                node = node[int(token)] if isinstance(node, list) else node[token]
                if isinstance(node, dict):
                    declared = node.get("id")
                    if isinstance(declared, str) and declared:
                        scope = urllib.parse.urljoin(scope, declared)
            new_base = scope
        return sub, new_base, f"{doc_uri}#{fragment}"


def parse_schema(schema: Any, registry: SchemaRegistry | None = None) -> tuple[SchemaRegistry, str]:
    """Register one schema (creating a registry if needed); returns
    (registry, root document URI)."""
    registry = registry or SchemaRegistry()
    uri = registry.add(schema)
    return registry, uri
