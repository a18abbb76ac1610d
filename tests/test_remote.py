"""Remote (REST/JSON) terminology source — the reference's
RemoteTerminology/BioPortalTerminology op vocabulary (terminology/impl/
RemoteTerminology.java:24-218) re-expressed over HTTP GET + JSON with an
injectable transport. All tests are offline: a dict-backed stub
transport, plus one in-process 127.0.0.1 http.server leg that exercises
the real urllib default transport end-to-end into the Spark matcher."""

import json
import threading

import pytest

CONCEPTS = [
    {"cui": "C0001", "name": "melanoma",
     "synonyms": ["melanoma", "malignant melanoma"],
     "semtypes": ["Neoplastic Process"], "sources": ["NCI"],
     "definition": "a malignant neoplasm of melanocytes",
     "codes": [["NCI", "C0025202"]]},
    {"cui": "C0002", "name": "nevus", "synonyms": ["nevus", "mole"],
     "semtypes": ["Finding"], "sources": ["SNOMEDCT"]},
    {"cui": "C0003", "name": "neoplasm", "synonyms": ["neoplasm"],
     "semtypes": ["Neoplastic Process"], "sources": ["NCI"]},
]
EDGES = [["C0001", "C0003"], ["C0002", "C0003"]]


def _route(path_q: str) -> object:
    """Shared fake server logic: path?query → JSON-able response."""
    path, _, q = path_q.partition("?")
    params = dict(kv.split("=", 1) for kv in q.split("&") if kv)
    if path == "/terminologies":
        return ["NCI_Thesaurus"]
    if path == "/sources":
        return ["NCI", "SNOMEDCT"]
    if path == "/search":
        txt = params.get("q", "").replace("+", " ").replace("%20", " ")
        return [c for c in CONCEPTS
                if any(txt.lower() in s for s in c["synonyms"])]
    if path.startswith("/concept/"):
        code = path.rsplit("/", 1)[1]
        return next((c for c in CONCEPTS if c["cui"] == code), None)
    if path.startswith("/related/"):
        code = path.rsplit("/", 1)[1]
        rel = {"BROADER": [p for ch, p in EDGES if ch == code]}
        if params.get("relation"):
            rel = {params["relation"]: rel.get(params["relation"], [])}
        return rel
    if path == "/concepts":
        off, lim = int(params.get("offset", 0)), int(params.get("limit", 2))
        return {"concepts": CONCEPTS[off:off + lim],
                "edges": EDGES if off == 0 else [],
                "total": len(CONCEPTS)}
    raise AssertionError(f"unrouted path {path_q}")


def _stub(base: str):
    """Dict-free stub transport; records every URL it serves."""
    served = []

    def fetch(url):
        assert url.startswith(base)
        served.append(url)
        return json.dumps(_route(url[len(base):])).encode()
    return fetch, served


def test_remote_ops_stub_transport():
    """The op vocabulary: search / lookup / related / sources /
    terminologies, the ``term`` property stamped on every request
    (RemoteTerminology.filter, java:73-79), and the client-side source
    filter (setSourceFilter, java:117-120)."""
    from nobletools_spark.sources.remote import RemoteTerminology

    base = "http://term.example/api"
    fetch, served = _stub(base)
    rt = RemoteTerminology(base, transport=fetch,
                           terminology="NCI_Thesaurus", page_size=2)

    assert rt.get_terminologies() == ["NCI_Thesaurus"]
    assert rt.get_sources() == ["NCI", "SNOMEDCT"]
    # every request carries the selected terminology (Parcel 'term')
    assert all("term=NCI_Thesaurus" in u for u in served)

    hits = rt.search("melanoma")
    assert [c["cui"] for c in hits] == ["C0001"]
    assert hits[0]["codes"] == (("NCI", "C0025202"),)

    c = rt.lookup_concept("C0002")
    assert c["name"] == "nevus" and c["semtypes"] == ("Finding",)
    assert rt.lookup_concept("NOPE") is None

    assert rt.get_related_concepts("C0001") == {"BROADER": ["C0003"]}
    assert rt.get_related_concepts("C0001", relation="NARROWER") == \
        {"NARROWER": []}

    # source filter drops non-matching concepts client-side
    rt.set_source_filter(["SNOMEDCT"])
    assert rt.lookup_concept("C0001") is None
    assert [c["cui"] for c in rt.search("nevus")] == ["C0002"]


def test_remote_fetch_all_paging():
    """fetch_all pages by offset/limit to the reported total, dedupes
    concepts and edges, and the max_concepts guard trips loudly."""
    from nobletools_spark.sources.remote import RemoteTerminology

    base = "http://term.example/api"
    fetch, served = _stub(base)
    rt = RemoteTerminology(base, transport=fetch, page_size=2)

    concepts, edges = rt.fetch_all()
    assert [c["cui"] for c in concepts] == ["C0001", "C0002", "C0003"]
    assert edges == [("C0001", "C0003"), ("C0002", "C0003")]
    assert sum("concepts?" in u for u in served) == 2  # two pages

    with pytest.raises(ValueError, match="max_concepts=1"):
        RemoteTerminology(base, transport=fetch,
                          page_size=2).fetch_all(max_concepts=1)


def test_remote_fetch_all_no_progress_break():
    """A server that ignores offset and reports no total must not page
    forever: a page contributing zero new concepts ends the snapshot."""
    from nobletools_spark.sources.remote import RemoteTerminology

    calls = []

    def fetch(url):
        calls.append(url)
        return json.dumps({"concepts": CONCEPTS[:2], "edges": []}).encode()

    concepts, _ = RemoteTerminology("http://x", transport=fetch,
                                    page_size=2).fetch_all()
    assert [c["cui"] for c in concepts] == ["C0001", "C0002"]
    assert len(calls) == 2  # first page + the no-progress repeat, then stop


def test_remote_fetch_all_filtered_page_keeps_paging():
    """Progress is measured in raw unseen CUIs, not kept ones: on a
    total-less server, a page whose concepts are all NEW but rejected
    by the client-side source filter must not end the snapshot — that
    would silently truncate the terminology (the module docstring's
    worst failure mode)."""
    from nobletools_spark.sources.remote import RemoteTerminology

    def fetch(url):
        _, _, q = url.partition("?")
        params = dict(kv.split("=", 1) for kv in q.split("&") if kv)
        off = int(params.get("offset", 0))
        # page 0 = C0001 (NCI), page 1 = C0002 (SNOMEDCT, filtered out),
        # page 2 = C0003 (NCI), page 3 = empty — and NO total reported
        page = CONCEPTS[off:off + 1]
        return json.dumps({"concepts": page, "edges": []}).encode()

    rt = RemoteTerminology("http://x", transport=fetch, page_size=1)
    rt.set_source_filter(["NCI"])
    concepts, _ = rt.fetch_all()
    assert [c["cui"] for c in concepts] == ["C0001", "C0003"]


def test_remote_http_end_to_end(spark):
    """Real transport leg: an in-process 127.0.0.1 http.server serves
    the endpoint contract; from_remote snapshots it into the broadcast
    index ONCE (no executor-side RPC) and annotate runs pure-Spark."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from nobletools_spark.api import NobleCoderSpark
    from nobletools_spark.sources.fixtures import SPANS_DDL
    from nobletools_spark.sources.remote import RemoteTerminology

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps(_route(self.path)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        rt = RemoteTerminology(f"http://127.0.0.1:{srv.server_port}")
        nc = NobleCoderSpark.from_remote(spark, rt)
        assert ("C0001", "C0003") in nc.isa_edges
        docs = spark.createDataFrame(
            [("d1", [("text", "biopsy consistent with malignant "
                              "melanoma and a benign nevus.", None, 0)])],
            SPANS_DDL)
        rows = nc.annotate(docs).collect()
        assert {r.cui for r in rows} == {"C0001", "C0002"}
    finally:
        srv.shutdown()
        srv.server_close()
