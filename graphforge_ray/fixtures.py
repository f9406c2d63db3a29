"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Every row is a pure function of ``(seed, row_index)`` via blake2b — workers
and reruns generate byte-identical rows with no shared RNG state. Payload
kinds rotate ``row_idx % 4``:

    0  RDF/XML ontology snippet — exercises the reference extractor rules
       (owl:Class children, oneOf enumeration, `_:blank` fallback,
       rdf:resource vs trimmed-text objects, http→IRI typing)
    1  Turtle snippet — prefixes, lang/typed literals, cross-row duplicate
       triples (dedup/set-semantics check)
    2  HTML page — headings/paragraphs/anchors; anchors reuse entity IRIs
       from kind 0 → linking ground truth
    3  HTML page embedding a JSON record in <script type="application/json">
       — drives the RML column-to-triple mapping path

Domains are Zipf-skewed: ~20% of rows land on one popular domain
(exercises salt-based skew splitting in the canonicalization shuffle).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import PAGES_SCHEMA

__all__ = [
    "gen_page", "gen_pages_table", "write_pages_parquet",
    "gen_media_table", "media_dataset",
    "ENTITY_BASE", "CLASS_NAMES", "GAZETTEER",
]

SEED = 42
ENTITY_BASE = "http://graft.example/ont/"
EPOCH_US = 1_700_000_000_000_000  # fixed epoch, microseconds

# Popular domain first; rank-weighted (Zipf-ish) selection below puts ~20%
# of rows on it.
_DOMAINS = [
    "big.example.com", "alpha.example.org", "beta.example.net",
    "gamma.example.io", "delta.example.dev", "epsilon.example.co",
    "zeta.example.app", "eta.example.site", "theta.example.info",
    "iota.example.page",
]
_LANGS = ["en", "de", "fr", "es"]

# 3-level class hierarchy (property-path closure fixture): item classes →
# mid classes → Top.
CLASS_NAMES = [
    "Margherita", "Capricciosa", "Hawaiian", "Quattro", "Calzone",
    "Sourdough", "Baguette", "Ciabatta", "Focaccia", "Brioche",
]
_MID_CLASSES = ["Pizza", "Bread"]
_TOP_CLASS = "Food"

# surface form → entity IRI (NER gazetteer ground truth)
GAZETTEER = {name: f"{ENTITY_BASE}{name}" for name in CLASS_NAMES}
GAZETTEER.update({name: f"{ENTITY_BASE}{name}" for name in _MID_CLASSES})
GAZETTEER[_TOP_CLASS] = f"{ENTITY_BASE}{_TOP_CLASS}"


def _h(i: int, salt: str, seed: int) -> int:
    d = hashlib.blake2b(f"{seed}:{salt}:{i}".encode(), digest_size=8).digest()
    return int.from_bytes(d, "big")


def _domain(i: int, seed: int) -> str:
    # rank-weighted: weight(r) ∝ 1/(r+1); domain 0 gets ~20% of mass over
    # harmonic weights; deterministic per row.
    x = _h(i, "domain", seed) % 1000
    # cumulative thresholds over 1/(r+1) weights normalized to 1000
    weights = [1.0 / (r + 1) for r in range(len(_DOMAINS))]
    total = sum(weights)
    acc = 0.0
    for r, w in enumerate(weights):
        acc += w / total * 1000
        if x < acc:
            return _DOMAINS[r]
    return _DOMAINS[-1]


def _item_class(i: int, seed: int) -> str:
    return CLASS_NAMES[_h(i, "cls", seed) % len(CLASS_NAMES)]


def _mid_for(name: str) -> str:
    return _MID_CLASSES[0] if name in CLASS_NAMES[:5] else _MID_CLASSES[1]


def _rdfxml_payload(i: int, seed: int, rich: int = 1) -> str:
    name = _item_class(i, seed)
    mid = _mid_for(name)
    e = ENTITY_BASE
    variant_a = f"{e}{name}VarA{_h(i, 'va', seed) % 7}"
    variant_b = f"{e}{name}VarB{_h(i, 'vb', seed) % 7}"
    extra = "".join(
        f"""  <owl:Class rdf:about="{e}{_item_class(i * 131 + r, seed)}Rich{r}">
    <rdfs:label>  {_item_class(i * 131 + r, seed)} variant {r} </rdfs:label>
    <rdfs:subClassOf rdf:resource="{e}{_mid_for(_item_class(i * 131 + r, seed))}"/>
    <rdfs:comment>filler comment {_h(i, f'rc{r}', seed) % 10_000} with some prose text to parse</rdfs:comment>
  </owl:Class>
"""
        for r in range(rich - 1)
    )
    return f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:ex="{e}">
  <owl:Class rdf:about="{e}{name}">
    <rdfs:label>  {name}  </rdfs:label>
    <rdfs:subClassOf rdf:resource="{e}{mid}"/>
    <rdfs:comment>A deterministic fixture class #{_h(i, 'c', seed) % 100}</rdfs:comment>
    <owl:equivalentClass>
      <owl:Class>
        <owl:oneOf rdf:parseType="Collection">
          <rdf:Description rdf:about="{variant_a}"/>
          <rdf:Description rdf:about="{variant_b}"/>
        </owl:oneOf>
      </owl:Class>
    </owl:equivalentClass>
  </owl:Class>
  <owl:Class rdf:about="{e}{mid}">
    <rdfs:subClassOf rdf:resource="{e}{_TOP_CLASS}"/>
    <rdfs:label>{mid}</rdfs:label>
  </owl:Class>
  <ex:Orphan>
    <ex:seeAlso rdf:resource="{e}{name}"/>
  </ex:Orphan>
  <rdf:Description rdf:about="{e}{name}/detail">
    <ex:droppedTextProp>this text property is dropped by the walker</ex:droppedTextProp>
    <ex:Holder>
      <ex:linksTo rdf:resource="{e}{_TOP_CLASS}"/>
    </ex:Holder>
  </rdf:Description>
{extra}</rdf:RDF>
"""


def _turtle_payload(i: int, seed: int, rich: int = 1) -> str:
    name = _item_class(i, seed)
    mid = _mid_for(name)
    price = 5 + (_h(i, "price", seed) % 20)
    extra = "".join(
        f"""ex:order{_h(i, f'eo{r}', seed) % 100_000} ex:contains ex:{_item_class(i * 7 + r, seed)} ;
    ex:quantity {1 + _h(i, f'eq{r}', seed) % 9} ;
    ex:note "deterministic filler note {_h(i, f'en{r}', seed) % 10_000}"@en .
"""
        for r in range(rich - 1)
    )
    # duplicate-across-rows triple: every turtle row re-asserts the mid→Top
    # subclass edge (set semantics must collapse it). The owl:Restriction
    # bnode `[ … ]`, the ingredient collection `( … )`, the triple-quoted
    # description and the exponent literal exercise the full Turtle grammar
    # (every OWL ontology in the wild uses the `[ ]` form).
    return f"""@prefix ex: <{ENTITY_BASE}> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
ex:{name} a ex:{mid} ;
    rdfs:label "{name}"@en ;
    ex:price {price} ;
    ex:density {1 + _h(i, 'dn', seed) % 9}.{_h(i, 'df', seed) % 100}e-2 ;
    rdfs:subClassOf [ a owl:Restriction ;
        owl:onProperty ex:servedAt ;
        owl:someValuesFrom ex:{_DOMAINS[_h(i, 'rv', seed) % 3].split('.')[0]} ] ;
    ex:ingredients ( ex:Flour ex:Water "salt {_h(i, 'ig', seed) % 3}" ) ;
    rdfs:comment \"\"\"A {name}:
a "{mid}" variant, fixture #{_h(i, 'tc', seed) % 1000}.\"\"\"@en ;
    ex:servedWith "salad {_h(i, 'sw', seed) % 5}" .
ex:{mid} rdfs:subClassOf ex:{_TOP_CLASS} .
ex:order{_h(i, 'ord', seed) % 1000} ex:contains ex:{name} ;
    ex:quantity {1 + _h(i, 'q', seed) % 9} .
""" + extra


def _html_payload(i: int, seed: int, rich: int = 1) -> str:
    name = _item_class(i, seed)
    other = CLASS_NAMES[_h(i, "other", seed) % len(CLASS_NAMES)]
    mid = _mid_for(name)
    extra = "".join(
        f"""<p>Paragraph {r}: the {_item_class(i * 13 + r, seed)} remains a topic of
conversation among enthusiasts of {mid} preparations, with number
{_h(i, f'hp{r}', seed) % 1000} appearances in the corpus and a link to
<a href="{ENTITY_BASE}{_item_class(i * 13 + r, seed)}">{_item_class(i * 13 + r, seed)}</a>.</p>
"""
        for r in range(rich - 1)
    )
    return f"""<html><head><title>All about {name}</title>
<script>var tracking = "ignored {i}";</script>
<style>body {{ color: black; }}</style>
</head><body>
<h1>{name} — a classic {mid}</h1>
<p>The   {name} is a kind of <a href="{ENTITY_BASE}{mid}">{mid}</a>
enjoyed worldwide. Many prefer {other} as an alternative.</p>
<p>Read more about <a href="https://graft.example/ont/{name}/">{name}</a> and
<a href="{ENTITY_BASE}{_TOP_CLASS}">Food</a> generally.</p>
<ul><li>rank {_h(i, 'rank', seed) % 50}</li><li>page {i}</li></ul>
{extra}</body></html>
"""


def _json_payload(i: int, seed: int, rich: int = 1) -> str:
    name = _item_class(i, seed)
    other = CLASS_NAMES[_h(i, "rel", seed) % len(CLASS_NAMES)]
    mid = _mid_for(name)
    recs = ", ".join(
        '{"id": %d, "name": "%s%d", "type": "%s%s", "related": ["%s%s"]}'
        % (
            _h(i, f"jr{r}", seed) % 1_000_000,
            _item_class(i * 17 + r, seed), r,
            ENTITY_BASE, _mid_for(_item_class(i * 17 + r, seed)),
            ENTITY_BASE, CLASS_NAMES[_h(i, f"jl{r}", seed) % len(CLASS_NAMES)],
        )
        for r in range(rich - 1)
    )
    rec = (
        '{"id": %d, "name": "%s", "type": "%s%s", "related": ["%s%s", "%s%s"]}'
        % (
            _h(i, "jid", seed) % 10_000, name, ENTITY_BASE, mid,
            ENTITY_BASE, other, ENTITY_BASE, _TOP_CLASS,
        )
    )
    return f"""<html><head><title>{name} record</title></head><body>
<h1>Record {i}</h1>
<script type="application/json">[{rec}{", " if recs else ""}{recs}]</script>
<p>Structured record for {name}.</p>
</body></html>
"""


_PAYLOAD_FNS = [_rdfxml_payload, _turtle_payload, _html_payload, _json_payload]
KINDS = ["rdfxml", "turtle", "html", "json"]
_EXT = {"rdfxml": "owl", "turtle": "ttl", "html": "html", "json": "html"}


def gen_page(i: int, seed: int = SEED, rich: int = 1) -> dict:
    kind = KINDS[i % 4]
    payload = _PAYLOAD_FNS[i % 4](i, seed, rich)
    domain = _domain(i, seed)
    url = f"https://{domain}/page/{i}.{_EXT[kind]}"
    return {
        "url": url,
        "warc_ts": EPOCH_US + i * 1_000_000,
        "html": payload.encode("utf-8"),
        "text": "",  # pipeline fills; per-url byte-identity is the invariant
        "lang": _LANGS[_h(i, "lang", seed) % len(_LANGS)],
    }


def gen_pages_table(
    n: int, seed: int = SEED, start: int = 0, rich: int = 1
) -> pa.Table:
    """``rich`` scales per-page payload size (≈rich× parse compute) —
    bench uses rich>1 so the corpus is compute-dominated like real
    Common-Crawl pages (tens of KB), while unit fixtures stay tiny."""
    rows = [gen_page(i, seed, rich) for i in range(start, start + n)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def pages_dataset(
    n: int, seed: int = SEED, num_blocks: int | None = None, rich: int = 1
):
    """Generate the corpus as a PARALLEL multi-block Dataset: generation is
    a pure function of row index, so blocks are produced independently by
    ``rd.range(n).map_batches`` — no single-block driver bottleneck (a
    ``from_arrow`` table is one block → one task downstream)."""
    import ray.data as rd

    if num_blocks is None:
        num_blocks = max(8, n // 500)

    def make(batch) -> pa.Table:
        ids = batch["id"].tolist() if hasattr(batch["id"], "tolist") else list(batch["id"])
        return pa.Table.from_pylist(
            [gen_page(int(i), seed, rich) for i in ids], schema=PAGES_SCHEMA
        )

    return rd.range(n, override_num_blocks=num_blocks).map_batches(
        make, batch_format="numpy"
    )


MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),      # ppm | pgm | wav | gfimg | gfaud | poison
        ("payload", pa.binary()),
    ]
)

_MEDIA_KINDS = ["ppm", "pgm", "png", "wav", "gfimg", "gfaud", "poison",
                "gif", "jpeg"]


def _media_bytes(i: int, seed: int) -> tuple[str, bytes]:
    """One deterministic media payload — pure function of (seed, i).
    Rotates real decodable formats (binary PPM/PGM images, a real
    COMPRESSED PNG whose scanline filter type cycles 0-4 so every
    unfilter branch runs in the contract, a COMPRESSED GIF through the
    from-scratch LZW codec, a baseline JPEG cycling 4:4:4/4:2:0/4:2:2
    chroma and restart intervals, RIFF PCM-16 WAV), the GFIMG/GFAUD
    fixture formats, and one POISON payload (a TRUNCATED JPEG — valid
    SOI/APP0 markers, garbage after — whose parse failure exercises the
    quarantine row path). New kinds append at the END of the rotation so
    lower ids keep their earlier kinds (pinned goldens stay valid)."""
    kind = _MEDIA_KINDS[i % len(_MEDIA_KINDS)]
    raw = hashlib.blake2b(f"media:{seed}:{i}".encode(), digest_size=32).digest()
    if kind == "jpeg":
        from .stages.codecs import encode_jpeg

        w, h = 18 + i % 5, 14 + i % 3
        # smooth gradient + payload-derived low-amplitude texture (JPEG
        # is lossy; smooth content keeps the decode deterministic-ish,
        # and the golden pins the EXACT decoded hash anyway)
        yy, xx = np.mgrid[0:h, 0:w]
        base = (yy * 9 + xx * 5) % 256
        tex = np.frombuffer(
            (raw * (w * h * 3 // len(raw) + 1))[: w * h * 3], dtype=np.uint8
        ).reshape(h, w, 3) % 16
        pixels = np.clip(base[..., None] + tex, 0, 255).astype(np.uint8)
        # i // 9 (the jpeg ordinal), not i: every jpeg id is ≡ 8 mod 9,
        # so i % 3 would pin one constant layout for the whole corpus
        return kind, encode_jpeg(
            pixels,
            quality=90,
            subsampling=("444", "420", "422")[(i // 9) % 3],
            restart_interval=(i // 9) % 3,
        )
    if kind == "png":
        from .stages.codecs import encode_png

        w, h = 7 + i % 4, 5 + i % 3
        n = w * h * 3
        pixels = np.frombuffer(
            (raw * (n // len(raw) + 1))[:n], dtype=np.uint8
        ).reshape(h, w, 3)
        return kind, encode_png(pixels, filter_type=(i // 7) % 5)
    if kind == "gif":
        from .stages.codecs import encode_gif

        w, h = 9 + i % 4, 7 + i % 3
        n = w * h * 3
        pixels = np.frombuffer(
            (raw * (n // len(raw) + 1))[:n], dtype=np.uint8
        ).reshape(h, w, 3)  # ≤ w*h distinct colors, well under 256
        return kind, encode_gif(pixels)
    if kind in ("ppm", "pgm"):
        w, h = 8 + i % 5, 6 + i % 3
        c = 3 if kind == "ppm" else 1
        n = w * h * c
        pixels = (raw * (n // len(raw) + 1))[:n]
        magic = b"P6" if kind == "ppm" else b"P5"
        return kind, magic + f"\n{w} {h}\n255\n".encode() + pixels
    if kind == "wav":
        import io
        import wave

        n = 64 + (i % 4) * 16
        pcm = (raw * (2 * n // len(raw) + 1))[: 2 * n]  # 16-bit samples
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(pcm)
        return kind, buf.getvalue()
    if kind == "gfimg":
        from .stages.multimodal import fake_image_bytes

        return kind, fake_image_bytes(seed * 1_000_003 + i)
    if kind == "gfaud":
        from .stages.multimodal import fake_audio_bytes

        return kind, fake_audio_bytes(seed * 1_000_003 + i)
    # truncated JPEG: real SOI/APP0, garbage after → corrupt-parse poison
    return kind, b"\xff\xd8\xff\xe0" + raw


def gen_media_table(n: int, seed: int = SEED, start: int = 0) -> pa.Table:
    rows = []
    for i in range(start, start + n):
        kind, payload = _media_bytes(i, seed)
        rows.append({"media_id": i, "kind": kind, "payload": payload})
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def media_dataset(n: int, seed: int = SEED, num_blocks: int | None = None):
    """Media corpus as a parallel multi-block Dataset (generation is a
    pure function of row index; blocks are produced independently)."""
    import ray.data as rd

    if num_blocks is None:
        num_blocks = max(4, n // 256)

    def make(batch) -> pa.Table:
        ids = (
            batch["id"].tolist()
            if hasattr(batch["id"], "tolist")
            else list(batch["id"])
        )
        return gen_media_table(len(ids), seed, int(ids[0])) if ids else (
            pa.Table.from_pylist([], schema=MEDIA_SCHEMA)
        )

    return rd.range(n, override_num_blocks=num_blocks).map_batches(
        make, batch_format="numpy"
    )


def _neardup_media_bytes(i: int, seed: int) -> tuple[str, bytes]:
    """One row of the planted-near-dup image corpus — pure function of
    (seed, i), rotation of 4:

    - ``i ≡ 0 (mod 4)``: a base GFIMG image (16×12×3, pixels in 0..254);
    - ``i ≡ 1``: its brightness-shifted copy (+1 per pixel, never
      clipping) — dHash-identical (gradient signs invariant), thumbnail
      MSE exactly 1.0: the PLANTED near-dup pair (i−1, i);
    - ``i ≡ 2``: an unrelated image (its own hash stream);
    - ``i ≡ 3``: POISON (truncated GFIMG header) → sentinel row.
    """
    w, h, c = 16, 12, 3
    n = w * h * c
    kind = ("base", "neardup", "other", "poison")[i % 4]
    if kind == "poison":
        return kind, b"GFIMG|16|"
    key = f"ndimg:{seed}:{i // 4}" if kind in ("base", "neardup") else (
        f"ndother:{seed}:{i}"
    )
    raw = hashlib.blake2b(key.encode(), digest_size=32).digest()
    pixels = (
        np.frombuffer((raw * (n // len(raw) + 1))[:n], dtype=np.uint8)
        % 255
    )
    if kind == "neardup":
        pixels = pixels + 1  # ≤ 255 by construction
    return kind, f"GFIMG|{w}|{h}|{c}|".encode() + pixels.tobytes()


def neardup_media_dataset(
    n: int, seed: int = SEED, num_blocks: int | None = None
):
    """Planted-near-dup image corpus as a multi-block Dataset (pure
    function of row index — same discipline as ``media_dataset``)."""
    import ray.data as rd

    if num_blocks is None:
        num_blocks = max(4, n // 256)

    def make(batch) -> pa.Table:
        ids = (
            batch["id"].tolist()
            if hasattr(batch["id"], "tolist")
            else list(batch["id"])
        )
        rows = []
        for i in ids:
            kind, payload = _neardup_media_bytes(int(i), seed)
            rows.append(
                {"media_id": int(i), "kind": kind, "payload": payload}
            )
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return rd.range(n, override_num_blocks=num_blocks).map_batches(
        make, batch_format="numpy"
    )


def _neardup_audio_bytes(i: int, seed: int) -> tuple[str, bytes]:
    """One row of the planted-near-dup audio corpus — pure function of
    (seed, i), rotation of 4 (the audio sibling of
    ``_neardup_media_bytes``):

    - ``i ≡ 0 (mod 4)``: a base GFAUD clip (8 kHz, 512 uint8 samples in
      0..254);
    - ``i ≡ 1``: its amplitude-shifted copy (+1 per sample, never
      clipping) — fingerprint-identical (frame-mean GRADIENT signs are
      DC-shift invariant), envelope MSE exactly (1/128)²: the PLANTED
      near-dup pair (i−1, i);
    - ``i ≡ 2``: an unrelated clip (its own sample stream);
    - ``i ≡ 3``: POISON (truncated GFAUD header) → sentinel row.
    """
    n = 512
    kind = ("base", "neardup", "other", "poison")[i % 4]
    if kind == "poison":
        return kind, b"GFAUD|8000|"
    key = f"ndaud:{seed}:{i // 4}" if kind in ("base", "neardup") else (
        f"ndaudother:{seed}:{i}"
    )
    raw = hashlib.blake2b(key.encode(), digest_size=32).digest()
    samples = (
        np.frombuffer((raw * (n // len(raw) + 1))[:n], dtype=np.uint8)
        % 255
    )
    if kind == "neardup":
        samples = samples + 1  # ≤ 255 by construction
    return kind, b"GFAUD|8000|512|" + samples.tobytes()


def neardup_audio_dataset(
    n: int, seed: int = SEED, num_blocks: int | None = None
):
    """Planted-near-dup audio corpus as a multi-block Dataset (pure
    function of row index — same discipline as ``media_dataset``)."""
    import ray.data as rd

    if num_blocks is None:
        num_blocks = max(4, n // 256)

    def make(batch) -> pa.Table:
        ids = (
            batch["id"].tolist()
            if hasattr(batch["id"], "tolist")
            else list(batch["id"])
        )
        rows = []
        for i in ids:
            kind, payload = _neardup_audio_bytes(int(i), seed)
            rows.append(
                {"media_id": int(i), "kind": kind, "payload": payload}
            )
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return rd.range(n, override_num_blocks=num_blocks).map_batches(
        make, batch_format="numpy"
    )


def write_pages_parquet(
    out_dir: str,
    n: int,
    seed: int = SEED,
    rows_per_file: int = 2000,
    rich: int = 1,
) -> list[str]:
    """Write the corpus as multiple parquet files (file = unit of work /
    partition, mirroring production shard layout). Skips files that already
    exist (generation is deterministic, so an existing file is valid —
    the ``rich`` level is part of the filename for that reason)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    suffix = "" if rich == 1 else f"-r{rich}"
    for start in range(0, n, rows_per_file):
        count = min(rows_per_file, n - start)
        path = os.path.join(
            out_dir, f"pages-{start:09d}-{count}{suffix}.parquet"
        )
        paths.append(path)
        if not os.path.exists(path):
            pq.write_table(gen_pages_table(count, seed, start, rich), path)
    return paths
