"""IRI surface-form normalization (leaf module — no Ray imports).

Canonical spelling rules (applied at EMISSION time to link-derived IRIs,
so the dedup shuffle is keyed on normalized surface forms with no extra
pass): scheme + host casefolded (case-insensitive per RFC 3986 — the PATH
stays case-sensitive so distinct entities don't merge), https unified to
http, trailing slashes/whitespace stripped to a fixpoint (the function
must be IDEMPOTENT — stripping a single trailing '/' could expose
trailing whitespace or another slash, so a second normalize would differ;
found by the hypothesis idempotence property). Reference-extracted
triples are NEVER normalized (byte-exact P/R parity with the reference
walker).
"""

from __future__ import annotations

__all__ = ["normalize_iri"]


def normalize_iri(iri: str) -> str:
    norm = iri.strip()
    scheme_end = norm.find("://")
    if scheme_end > 0:
        host_end = norm.find("/", scheme_end + 3)
        if host_end == -1:
            host_end = len(norm)
        norm = norm[:host_end].casefold() + norm[host_end:]
        if norm.startswith("https://"):
            norm = "http://" + norm[len("https://"):]
    while True:
        stripped = norm.rstrip().rstrip("/")
        if stripped == norm:
            return norm
        norm = stripped
