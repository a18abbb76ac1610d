"""Remote (REST/JSON) terminology source (reference:
terminology/impl/RemoteTerminology.java:24-218 — a thin proxy that
forwards search / lookup_concept / get_related_concepts / get_sources /
set_sources / get_terminologies to a terminology server; and
terminology/impl/BioPortalTerminology.java:41-352 — the same op
vocabulary over HTTP REST).

The reference's wire format is Java object serialization
(util/Sender + util/Parcel) — non-portable by construction — so this
re-expression keeps the OPERATION vocabulary and filter semantics and
maps them onto plain HTTP GET + JSON:

    GET {base}/terminologies              -> ["NCI_Thesaurus", ...]
    GET {base}/sources                    -> ["NCI", "SNOMEDCT", ...]
    GET {base}/search?q=TEXT[&term=T]     -> [concept, ...]
    GET {base}/concept/CODE[?term=T]      -> concept | null
    GET {base}/related/CODE[?relation=R]  -> {"BROADER": [codes], ...}
    GET {base}/concepts?offset=O&limit=L  -> {"concepts": [...],
                                              "edges": [[child,parent]..],
                                              "total": N}

where a concept is ``{"cui": ..., "name": ..., "synonyms": [...],
"semtypes": [...], "sources": [...], "definition": ..., "codes":
[[sab, code], ...]}`` — exactly the dict schema every other loader in
this package emits (sources/obo.py, sources/owl.py), so remote concepts
flow into ``build_index_df`` and the broadcast matcher unchanged.

Design points vs the reference:

- The ``term`` property RemoteTerminology.filter() stamps on every
  Parcel (RemoteTerminology.java:73-79, setTerminology) becomes a
  ``term=`` query parameter appended to every request.
- ``set_source_filter`` is applied CLIENT-side on returned concepts
  (drop concepts whose ``sources`` don't intersect the filter) in
  addition to being forwarded — the reference forwards it statefully
  (``set_sources``), which breaks on stateless/load-balanced servers;
  client-side filtering keeps the semantics either way.
- ``transport`` is injectable (``Callable[[url], bytes]``) exactly like
  ``parse_owl``'s imports resolver, so tests and offline runs never
  touch a network; the default uses stdlib ``urllib`` with a timeout.
- ``fetch_all`` pages the full concept set down once so the terminology
  can be SNAPSHOT into the local index: at cluster scale a per-mention
  network lookup inside executors is the anti-pattern (N docs × RPC
  latency, plus a non-reproducible moving target); the engine instead
  materializes the remote terminology to the same broadcastable
  ``TerminologyIndex`` every other source builds, and the annotate path
  stays pure-Spark.
"""

from __future__ import annotations

import json
from typing import Callable
from urllib.parse import quote, urlencode

__all__ = ["RemoteTerminology", "default_transport"]


def default_transport(timeout: float = 30.0) -> Callable[[str], bytes]:
    """stdlib urllib GET → bytes; 404 → b"null" (a missing concept is a
    data answer, not a transport failure — RemoteTerminology.java:132-138
    returns null for an unknown CUI)."""
    def fetch(url: str) -> bytes:
        import urllib.error
        import urllib.request

        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return b"null"
            raise
    return fetch


def _as_concept(obj: dict) -> dict:
    """Normalize a wire concept into the package-wide concept dict
    (tuple-ized, codes as (sab, code) pairs) — tolerant of absent
    optional fields, strict on cui/name."""
    name = obj.get("name") or obj["cui"]
    return {
        "cui": obj["cui"],
        "name": name,
        "synonyms": tuple(obj.get("synonyms") or (name,)),
        "semtypes": tuple(obj.get("semtypes") or ()),
        "sources": tuple(obj.get("sources") or ()),
        "definition": obj.get("definition"),
        "codes": tuple((s, c) for s, c in obj.get("codes") or ()),
    }


class RemoteTerminology:
    """REST/JSON terminology client + snapshot materializer (see module
    docstring for the endpoint contract and reference citations)."""

    def __init__(self, base_url: str,
                 transport: Callable[[str], bytes] | None = None,
                 terminology: str | None = None,
                 page_size: int = 1000):
        self.base_url = base_url.rstrip("/")
        self._fetch = transport or default_transport()
        self.terminology = terminology  # setTerminology(str) equivalent
        self.page_size = page_size
        self._source_filter: tuple[str, ...] = ()

    # -- plumbing ---------------------------------------------------------

    def _get(self, path: str, **params) -> object:
        if self.terminology is not None:
            params.setdefault("term", self.terminology)
        qs = urlencode({k: v for k, v in params.items() if v is not None})
        url = f"{self.base_url}/{path}" + (f"?{qs}" if qs else "")
        return json.loads(self._fetch(url).decode("utf-8"))

    def _keep(self, concept: dict) -> bool:
        if not self._source_filter:
            return True
        return bool(set(concept["sources"]) & set(self._source_filter)) \
            or not concept["sources"]

    # -- the reference's op vocabulary ------------------------------------

    def get_terminologies(self) -> list[str]:
        """RemoteTerminology.getAvailableTerminologies (java:54-57)."""
        return list(self._get("terminologies"))

    def get_sources(self) -> list[str]:
        """RemoteTerminology.getSources (java:109-111)."""
        return list(self._get("sources"))

    def set_source_filter(self, sources) -> None:
        """RemoteTerminology.setSourceFilter (java:117-120), applied
        client-side on every subsequent result (module docstring)."""
        self._source_filter = tuple(sources)

    def get_source_filter(self) -> tuple[str, ...]:
        return self._source_filter

    def search(self, text: str) -> list[dict]:
        """RemoteTerminology.search (java:144-152); empty list, never
        None, on no hits."""
        hits = self._get("search", q=text) or []
        return [c for c in map(_as_concept, hits) if self._keep(c)]

    def lookup_concept(self, code: str) -> dict | None:
        """RemoteTerminology.lookupConcept (java:132-138); None for an
        unknown code."""
        obj = self._get(f"concept/{quote(code, safe='')}")
        if obj is None:
            return None
        c = _as_concept(obj)
        return c if self._keep(c) else None

    def get_related_concepts(self, code: str,
                             relation: str | None = None) -> dict:
        """RemoteTerminology.getRelatedConcepts (java:91-103) — with a
        relation: {relation: [codes]}; without: the full relation map."""
        rel = self._get(f"related/{quote(code, safe='')}",
                        relation=relation) or {}
        return {k: list(v) for k, v in rel.items()}

    # -- the Spark path: snapshot → broadcastable index --------------------

    def fetch_all(self, max_concepts: int | None = None
                  ) -> tuple[list[dict], list[tuple[str, str]]]:
        """Page the remote terminology down to (concepts, isa_edges) in
        the shared loader output shape (parse_obo/parse_owl parity).
        Pages by offset/limit; stops at ``total`` (or when a page comes
        back short / empty, for servers that don't report totals).
        ``max_concepts`` is a hard client-side guard for accidentally
        snapshotting a huge terminology."""
        concepts: list[dict] = []
        edges: list[tuple[str, str]] = []
        seen: set[str] = set()
        offset, total = 0, None
        while True:
            page = self._get("concepts", offset=offset,
                             limit=self.page_size)
            batch = page.get("concepts") or []
            fresh = 0
            for obj in batch:
                c = _as_concept(obj)
                if c["cui"] in seen:
                    continue
                # progress = raw unseen CUIs, NOT kept ones: a page whose
                # concepts are all new but rejected by the client-side
                # source/semtype filter is still forward progress — breaking
                # on it would silently truncate the snapshot mid-terminology
                seen.add(c["cui"])
                fresh += 1
                if not self._keep(c):
                    continue
                concepts.append(c)
            edges.extend((ch, pa) for ch, pa in page.get("edges") or ())
            total = page.get("total", total)
            offset += len(batch)
            if max_concepts is not None and len(concepts) > max_concepts:
                raise ValueError(
                    f"remote terminology exceeds max_concepts="
                    f"{max_concepts} (fetched {len(concepts)} so far); "
                    "raise the guard or filter server-side")
            if not batch or (total is not None and offset >= total):
                break
            if fresh == 0 and total is None:
                # a server that ignores ``offset`` and reports no total
                # would otherwise page forever; every concept in this
                # page was already seen → nothing further can arrive
                break
        # dedupe edges, preserve order (mirrors parse_owl's first-wins)
        return concepts, list(dict.fromkeys(edges))
