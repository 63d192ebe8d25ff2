"""Deterministic synthetic Common-Crawl-style page corpus + goldens.

FIXTURES.md §1–§3: generates, at a given scale factor,

- ``pages(url, warc_ts, html BINARY, text, lang)`` — the authoritative
  input shape (BASELINE.json:15). ``html`` is rendered wiki/HTML-ish
  markup with anchors, templates-to-strip, refs, comments, entities
  and a few malformed pages; ``text`` is the EXPECTED extracted plain
  text computed from the page *plan* (word/anchor token lists), NOT by
  running the extractor — so the byte-identity test exercises two
  independent code paths meeting at the same bytes.
- side tables ``surface_forms redirects disambiguations entity_types
  abstracts`` (the reference's NTriples-derived relations).
- golden outputs ``golden_text golden_pair_counts golden_uri_counts
  golden_sf_total_counts golden_token_counts golden_triples`` computed
  directly from the plan (P/R ground truth, FIXTURES.md §3).

Everything is seeded (seed=42 + per-page derived seeds); same sf ⇒
same bytes, across runs and machines. Output is cached as parquet
under ``<repo>/.synthdata/sf<sf>/`` and regenerated only if missing.

Corpus shape knobs (FIXTURES.md §1): Zipfian link-target distribution
(hub entities → skew), ~3–8 anchors/page, ~2% redirect pages with
chains len 2–4 + one 2-cycle + a dangling target, ~1% disambiguation
pages, a few empty/whitespace/malformed pages.
"""

from __future__ import annotations

import bisect
import random
from collections import Counter
from datetime import datetime, timedelta
from pathlib import Path

import pandas as pd

from pignlproc_spark.functions.ngrams import SurfaceFormMatcher, normalize_sf
from pignlproc_spark.functions.tokenize import tokenize
from pignlproc_spark.functions.uri import uri_encode

SEED = 42
GEN_VERSION = "13"  # bump → cached .synthdata regenerates
MAX_HOPS = 8  # frozen redirect-resolution bound (matches canonicalize)
URI_LANG = "en"  # URI base is a per-run constant, like the reference's lang param

VOCAB = (
    "alpha beta gamma delta epsilon zeta river mountain valley city bridge harbor "
    "engine turbine circuit signal vector matrix tensor kernel cluster node edge "
    "graph music painting novel poem battle treaty empire province island desert "
    "forest glacier comet nebula photon quark proton neutron enzyme protein cell "
    "market trade currency bank census law court senate treaty harvest wheat "
    "copper iron silver cobalt quartz basalt granite sandstone lighthouse castle "
    "abbey cathedral plaza avenue tunnel railway airport seaport festival carnival "
    "sonata symphony ballad chorus legend myth saga chronicle atlas compass sextant "
    "meridian equator tropic monsoon typhoon aurora eclipse solstice equinox tide "
    "reef lagoon fjord delta plateau steppe tundra savanna prairie orchard vineyard"
).split()

FILLER = (
    "the a an of in on at by with from into over under between through during "
    "before after above below is was are were has had will would can could may "
    "about many some few most other such same new old great small early late "
    "known famous located founded built named called described considered north east"
).split()

LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]
TYPES = ["Person", "Place", "Organisation", "Work"]


def sf_scale(sf: float) -> int:
    """pages at scale factor (FIXTURES.md §5: 500 / 5k / 50k)."""
    return max(50, int(round(500 * sf / 0.001)))


# ---------------------------------------------------------------------------
# plan model
# ---------------------------------------------------------------------------


def _entity_title(i: int) -> str:
    return f"{VOCAB[i % len(VOCAB)].capitalize()}_{i}"


def _entity_surfaces(i: int) -> list[str]:
    t = _entity_title(i)
    s1 = t.replace("_", " ")
    surfaces = [s1, s1.lower()]
    if i % 7 == 0:
        surfaces.append(f"the {s1.lower()}")
    if i % 97 == 0:
        # 6-token surface → exceeds matcher max_n → totalCount = -1 case
        surfaces.append(f"the great {s1.lower()} of old")
    return surfaces


def _escape(rng: random.Random, word: str) -> str:
    out = word.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if rng.random() < 0.05 and "&" not in out:
        for j, ch in enumerate(out):
            if ch in "aeiou":
                out = out[:j] + f"&#{ord(ch)};" + out[j + 1 :]
                break
    if rng.random() < 0.05:
        tag = rng.choice(["b", "i", "em"])
        out = f"<{tag}>{out}</{tag}>"
    return out


def _render_anchor(rng: random.Random, target: str, surface: str) -> str:
    esc = surface.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    href = target.replace(" ", "_")
    r = rng.random()
    if r < 0.55:
        if rng.random() < 0.1:
            href = href.replace("_", "%5F")
        return f'<a href="/wiki/{href}">{esc}</a>'
    if r < 0.7:
        return f'<a class="int" href="https://en.example.org/wiki/{href}">{esc}</a>'
    return f"[[{target}|{esc}]]"


class PagePlan:
    __slots__ = ("url", "lang", "kind", "redirect_dst", "blocks", "html", "text")

    def __init__(self, url: str, lang: str, kind: str):
        self.url = url
        self.lang = lang
        self.kind = kind
        self.redirect_dst: str | None = None
        # blocks: list of ("h", [words]) | ("p", [sentence]); sentence = [item];
        # item = ("w", word) | ("a", target_title, surface)
        self.blocks: list[tuple[str, list]] = []
        self.html = b""
        self.text = ""

    def anchors(self):
        for kind, payload in self.blocks:
            if kind != "p":
                continue
            for sent in payload:
                for item in sent:
                    if item[0] == "a":
                        yield item[1], item[2]

    def sentences(self):
        """(sentence_text, [(target, surface), ...]) per plan sentence."""
        for kind, payload in self.blocks:
            if kind != "p":
                continue
            for sent in payload:
                words = [it[1] if it[0] == "w" else it[2] for it in sent]
                anchors = [(it[1], it[2]) for it in sent if it[0] == "a"]
                yield " ".join(words) + ".", anchors

    def paragraphs(self):
        """(paragraph_text, [(target, surface), ...]) per 'p' block —
        the J7 granularity: one extractor paragraph span per block."""
        for kind, payload in self.blocks:
            if kind != "p":
                continue
            texts = [" ".join(_item_text(i) for i in s) + "." for s in payload]
            anchors = [(it[1], it[2]) for s in payload for it in s if it[0] == "a"]
            yield " ".join(texts), anchors


def _item_text(item) -> str:
    return item[1] if item[0] == "w" else item[2]


def _plan_text(plan: PagePlan) -> str:
    parts = []
    for kind, payload in plan.blocks:
        if kind == "h":
            parts.append(" ".join(payload))
        else:
            parts.append(" ".join(" ".join(_item_text(i) for i in s) + "." for s in payload))
    return "\n\n".join(p for p in parts if p)


def _render_html(rng: random.Random, plan: PagePlan) -> bytes:
    chunks: list[str] = []
    if rng.random() < 0.1:
        chunks.append("<html><body>")
    for kind, payload in plan.blocks:
        if rng.random() < 0.15:
            chunks.append("{{Infobox|key=value|n=" + str(rng.randrange(99)) + "}}")
        if kind == "h":
            lvl = rng.choice([2, 2, 3])
            chunks.append(f"<h{lvl}>" + " ".join(_escape(rng, w) for w in payload) + f"</h{lvl}>")
            continue
        sents = []
        for sent in payload:
            rendered = []
            for item in sent:
                if item[0] == "w":
                    rendered.append(_escape(rng, item[1]))
                else:
                    rendered.append(_render_anchor(rng, item[1], item[2]))
            s = " ".join(rendered)
            if rng.random() < 0.1:
                s += "<ref>cite {{sfn|loc=" + str(rng.randrange(99)) + "}}</ref>"
            sents.append(s + ".")
        body = " ".join(sents)
        if rng.random() < 0.1:
            body += "<!-- trailing comment -->"
        chunks.append("<p>" + body + "</p>")
    if rng.random() < 0.08:
        chunks.append("{{Navbox|list={{inner|x}}}}")
    if chunks and chunks[0] == "<html><body>":
        chunks.append("</body></html>")
    return "\n".join(chunks).encode("utf-8")


MALFORMED = [
    (b"<p>&broken; <unclosed</p>", "&broken; <unclosed"),
    (b"<p>stray > sign</p>", "stray > sign"),
    (b"{{unclosed template <p>after</p>", "{{unclosed template\n\nafter"),
]


# ---------------------------------------------------------------------------
# corpus generation
# ---------------------------------------------------------------------------


class Corpus:
    def __init__(self, sf: float):
        self.sf = sf
        self.n_pages = sf_scale(sf)
        self.build()

    def build(self) -> None:
        n_pages = self.n_pages
        n_entities = max(40, n_pages // 10)
        rng = random.Random(f"{SEED}:corpus:{self.sf}")

        # --- redirect graph (chains 2–4, one 2-cycle, one dangling) ---
        redirects: dict[str, str] = {}
        for c in range(max(2, n_entities // 25)):
            length = 2 + c % 3  # 2..4 nodes in chain
            target = _entity_title(c % n_entities)
            nodes = [f"Red_{c}_{k}" for k in range(length - 1)]
            for a, b in zip(nodes, nodes[1:]):
                redirects[a] = b
            redirects[nodes[-1]] = target
        redirects["CycA_0"] = "CycB_0"
        redirects["CycB_0"] = "CycA_0"
        redirects["Dang_0"] = "Missing_Target_999999"
        redirect_srcs = sorted(redirects)

        # --- disambiguation pages ---
        n_dabs = max(1, n_pages // 100)
        dabs: dict[str, list[str]] = {}
        for d in range(n_dabs):
            fan = 2 + d % 5
            dabs[f"Dab_{d}"] = [_entity_title((d * 13 + j * 7) % n_entities) for j in range(fan)]

        # --- link-target population: entities + redirect entries + dabs,
        #     Zipf-weighted (hub skew; FIXTURES.md §1) ---
        population = [_entity_title(i) for i in range(n_entities)] + redirect_srcs + sorted(dabs)
        weights = [1.0 / (r + 1) ** 1.05 for r in range(len(population))]
        cum = []
        acc = 0.0
        for w in weights:
            acc += w
            cum.append(acc)

        def sample_target(r: random.Random) -> str:
            return population[bisect.bisect_left(cum, r.random() * acc)]

        surfaces_by_title = {_entity_title(i): _entity_surfaces(i) for i in range(n_entities)}

        # --- contested surface forms (FIXTURES.md §1 ambiguity knob):
        # adjacent-Zipf-rank entity PAIRS share one surface, so the
        # pair's priors are comparable and P(uri|sf) alone cannot
        # resolve the minority side — context evidence has to ---
        contested: dict[str, tuple[str, str]] = {}
        for j in range(max(2, n_entities // 20)):
            a, b = _entity_title(2 * j), _entity_title(2 * j + 1)
            if a == b or 2 * j + 1 >= n_entities:
                continue
            shared = f"{VOCAB[(j * 11 + 5) % len(VOCAB)]} affair {j}"
            surfaces_by_title[a].append(shared)
            surfaces_by_title[b].append(shared)
            contested[shared] = (a, b)
        self.contested = contested

        def surfaces_for(title: str) -> list[str]:
            if title in surfaces_by_title:
                return surfaces_by_title[title]
            return [title.replace("_", " "), title.replace("_", " ").lower()]

        # --- page plans ---
        pages: list[PagePlan] = []
        base_ts = datetime(2024, 1, 1)

        def make_article(i: int, url: str, kind: str = "article", title: str | None = None) -> PagePlan:
            prng = random.Random(f"{SEED}:page:{i}")
            plan = PagePlan(url, LANGS[i % len(LANGS)], kind)
            n_blocks = 1 + prng.randrange(4)
            anchors_budget = 3 + prng.randrange(6)  # 3–8 anchors/page
            placed = 0
            for b in range(n_blocks):
                if b > 0 and prng.random() < 0.25:
                    plan.blocks.append(("h", [prng.choice(VOCAB), prng.choice(VOCAB)]))
                    continue
                sentences = []
                for _s in range(1 + prng.randrange(3)):
                    items: list = []
                    for _w in range(4 + prng.randrange(8)):
                        if prng.random() < 0.12:
                            items.append(("w", prng.choice(FILLER)))
                        elif prng.random() < 0.02:
                            items.append(("w", "r&d"))
                        else:
                            items.append(("w", prng.choice(VOCAB)))
                    n_anchor_here = 0
                    while placed < anchors_budget and n_anchor_here < 2 and prng.random() < 0.55:
                        target = title if (kind == "dab_target_unused") else sample_target(prng)
                        surface = prng.choice(surfaces_for(target))
                        pos = prng.randrange(len(items) + 1)
                        items.insert(pos, ("a", target, surface))
                        placed += 1
                        n_anchor_here += 1
                        # topic token: pages talk about what they link.
                        # One letters+digits word unique to the target
                        # ("alpha0") — the context-evidence signal the
                        # disambiguator needs to beat the bare prior on
                        # contested surfaces
                        if prng.random() < 0.8:
                            topic = target.replace("_", "").lower()
                            items.insert(prng.randrange(len(items) + 1), ("w", topic))
                    # unlinked surface-form occurrence (link-probability denominator)
                    if prng.random() < 0.3:
                        sf = prng.choice(surfaces_for(sample_target(prng)))
                        for k, tok in enumerate(sf.split(" ")):
                            items.insert(k, ("w", tok))
                    sentences.append(items)
                plan.blocks.append(("p", sentences))
            plan.text = _plan_text(plan)
            plan.html = _render_html(prng, plan)
            return plan

        i = 0

        def next_url() -> str:
            nonlocal i
            u = f"https://cc{i % 10}.example/p/{i:07d}"
            i += 1
            return u

        for src in redirect_srcs:
            plan = PagePlan(next_url(), "en", "redirect")
            plan.redirect_dst = redirects[src]
            prng = random.Random(f"{SEED}:r:{src}")
            dst = redirects[src]
            style = prng.random()
            if style < 0.5:
                plan.html = f"#REDIRECT [[{dst}]]".encode()
            elif style < 0.8:
                plan.html = f"#redirect [[{dst.replace('_', ' ')}]]".encode()
            else:
                plan.html = f"  #REDIRECT: [[{dst}|old name]]".encode()
            plan.text = ""
            pages.append(plan)

        for dab, candidates in sorted(dabs.items()):
            prng = random.Random(f"{SEED}:d:{dab}")
            plan = PagePlan(next_url(), "en", "dab")
            items: list = [("w", dab.replace("_", " ").lower()), ("w", "may"), ("w", "refer"), ("w", "to")]
            for c in candidates:
                items.append(("a", c, surfaces_for(c)[0]))
            plan.blocks = [("p", [items])]
            plan.text = _plan_text(plan)
            plan.html = _render_html(prng, plan)
            pages.append(plan)

        for html, text in MALFORMED:
            plan = PagePlan(next_url(), "en", "malformed")
            plan.html, plan.text = html, text
            pages.append(plan)
        for blank in (b"", b"   \n\t  "):
            plan = PagePlan(next_url(), "en", "empty")
            plan.html, plan.text = blank, ""
            pages.append(plan)

        while len(pages) < n_pages:
            pages.append(make_article(i, next_url()))

        self.pages = pages
        self.redirects = redirects
        self.dabs = dabs
        self.n_entities = n_entities
        self.base_ts = base_ts
        self.surfaces_by_title = surfaces_by_title

        # --- redirect resolution (frozen: follow ≤ MAX_HOPS, stop early) ---
        def resolve_title(t: str) -> str:
            cur = t
            for _ in range(MAX_HOPS):
                nxt = redirects.get(cur)
                if nxt is None:
                    return cur
                cur = nxt
            return cur

        self.resolve_title = resolve_title

        # --- goldens from the plan ---
        pair_counts: Counter = Counter()
        uri_counts: Counter = Counter()
        annotated: Counter = Counter()
        mentions: Counter = Counter()
        token_counts: Counter = Counter()
        ctx_mentions: Counter = Counter()  # (url, context, surface, uri)
        para_mentions: Counter = Counter()  # same keys, J7 granularity
        for p in pages:
            if p.kind == "redirect":
                continue
            for sent_text, anchors in p.sentences():
                for target, surface in anchors:
                    uri = uri_encode(resolve_title(target), URI_LANG)
                    pair_counts[(surface, uri)] += 1
                    uri_counts[uri] += 1
                    annotated[surface] += 1
                    mentions[(p.url, uri)] += 1
                    ctx_mentions[(p.url, sent_text, surface, uri)] += 1
                    for tok in tokenize(sent_text):
                        token_counts[(uri, tok)] += 1
            for para_text, anchors in p.paragraphs():
                for target, surface in anchors:
                    uri = uri_encode(resolve_title(target), URI_LANG)
                    para_mentions[(p.url, para_text, surface, uri)] += 1

        matcher = SurfaceFormMatcher(annotated.keys())
        totals: Counter = Counter()
        for p in pages:
            if p.kind == "redirect":
                continue
            for occ in matcher.occurrences(p.text):
                totals[occ] += 1
        sf_total = {}
        for sf in annotated:
            norm = normalize_sf(sf)
            sf_total[sf] = totals.get(norm, -1) if norm in matcher.forms else -1

        self.pair_counts = pair_counts
        self.uri_counts = uri_counts
        self.annotated = annotated
        self.sf_total = sf_total
        self.token_counts = token_counts
        self.mentions = mentions
        self.ctx_mentions = ctx_mentions
        self.para_mentions = para_mentions


# ---------------------------------------------------------------------------
# parquet materialization
# ---------------------------------------------------------------------------


import math
import struct


class _JpegBitWriter:
    """MSB-first bit emitter with 0xFF byte stuffing and 1-padded
    flush — shared by the baseline and progressive entropy coders."""

    def __init__(self):
        self.buf = 0
        self.cnt = 0
        self.body = bytearray()

    def emit(self, code, length):
        self.buf = (self.buf << length) | code
        self.cnt += length
        while self.cnt >= 8:
            self.cnt -= 8
            byte = (self.buf >> self.cnt) & 0xFF
            self.body.append(byte)
            if byte == 0xFF:
                self.body.append(0x00)

    def flush(self):
        if self.cnt:
            self.emit((1 << (8 - self.cnt)) - 1, 8 - self.cnt)


def _jpeg_magnitude(v):
    """F.12 magnitude category: value → (size, size-bit raw code)."""
    size = abs(v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _jpeg_plan(px_rows, mode):
    """Shared encoder front half: color convert, chroma downsample,
    MCU padding, forward DCT + quantize — everything UPSTREAM of the
    entropy coder, so baseline and progressive streams carry the SAME
    quantized coefficients (and therefore the same CCJpegRecon v1
    expected pixels from :func:`_jpeg_expected`).

    mode: '444' (YCbCr 1×1), '420' (Y 2×2, chroma 1×1, 2×2-mean
    downsample), 'grey' (single component).

    Huffman tables are self-constructed canonical fixed-length codes
    (DC: 12 symbols @ 4 bits; AC baseline: 162 symbols @ 8 bits;
    AC progressive: all 176 (run, size) symbols @ 8 bits so the EOBn
    run-length symbols 0x10..0xE0 exist) written into DHT — legal
    JPEG, chosen so correctness never depends on transcribing the
    Annex K example tables; the decoder must build whatever the
    stream declares.
    """
    # zigzag via diagonal sort — different algorithm than the
    # decoder's walk, same ISO sequence
    zzag = sorted(
        range(64),
        key=lambda i: (
            i // 8 + i % 8,
            (i // 8) if (i // 8 + i % 8) % 2 else -(i // 8),
        ),
    )
    qlum = [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ]
    qchrom = [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    ] + [99] * 32
    grey = mode == "grey"
    ph, pw = len(px_rows), len(px_rows[0])

    # --- color convert + plane build (encoder-side choices) ---
    def _clip8(v):
        return 0 if v < 0 else (255 if v > 255 else v)

    if grey:
        yp = [[px_rows[y][x][0] for x in range(pw)] for y in range(ph)]
        planes = {"Y": yp}
    else:
        yp, cbp, crp = [], [], []
        for row in px_rows:
            ry, rcb, rcr = [], [], []
            for r_, g_, b_ in row:
                ry.append(_clip8(round(0.299 * r_ + 0.587 * g_ + 0.114 * b_)))
                rcb.append(_clip8(round(-0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128)))
                rcr.append(_clip8(round(0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128)))
            yp.append(ry)
            cbp.append(rcb)
            crp.append(rcr)
        if mode in ("420", "422"):
            # chroma mean-downsample by (fdx, fdy): 2x2 for 4:2:0,
            # horizontal-only 2x1 for 4:2:2; +half rounding
            fdx, fdy = 2, (2 if mode == "420" else 1)
            ch, cw = (ph + fdy - 1) // fdy, (pw + fdx - 1) // fdx
            nvals = fdx * fdy

            def _down(p):
                out = []
                for cy in range(ch):
                    orow = []
                    for cx in range(cw):
                        vals = [
                            p[min(fdy * cy + dy, ph - 1)][min(fdx * cx + dx, pw - 1)]
                            for dy in range(fdy)
                            for dx in range(fdx)
                        ]
                        orow.append((sum(vals) + nvals // 2) // nvals)
                    out.append(orow)
                return out

            cbp, crp = _down(cbp), _down(crp)
        planes = {"Y": yp, "Cb": cbp, "Cr": crp}

    # sampling geometry
    if grey:
        comps = [("Y", 1, 1, 1, 0)]  # (plane, cid, h, v, qid)... cid set below
        hmax = vmax = 1
    elif mode == "420":
        comps = [("Y", 1, 2, 2, 0), ("Cb", 2, 1, 1, 1), ("Cr", 3, 1, 1, 1)]
        hmax = vmax = 2
    elif mode == "422":
        comps = [("Y", 1, 2, 1, 0), ("Cb", 2, 1, 1, 1), ("Cr", 3, 1, 1, 1)]
        hmax, vmax = 2, 1
    else:
        comps = [("Y", 1, 1, 1, 0), ("Cb", 2, 1, 1, 1), ("Cr", 3, 1, 1, 1)]
        hmax = vmax = 1
    mcux = -(-pw // (8 * hmax))
    mcuy = -(-ph // (8 * vmax))

    def _pad(plane, tw, th):
        h0, w0 = len(plane), len(plane[0])
        return [
            [plane[min(y, h0 - 1)][min(x, w0 - 1)] for x in range(tw)]
            for y in range(th)
        ]

    padded = {}
    for pname, cid, hi, vi, qid in comps:
        padded[pname] = _pad(planes[pname], mcux * hi * 8, mcuy * vi * 8)

    # --- forward DCT + quantize (encoder-side float is fine: the
    #     TRUTH is defined downstream of the quantized ints) ---
    cosx = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
    cu = [1 / math.sqrt(2)] + [1.0] * 7

    def _fdct_quant(plane, bx, by, qtab):
        out = [0] * 64
        for v in range(8):
            for u in range(8):
                s = 0.0
                for y in range(8):
                    for x in range(8):
                        s += (plane[by * 8 + y][bx * 8 + x] - 128) * cosx[u][x] * cosx[v][y]
                out[v * 8 + u] = round(0.25 * cu[u] * cu[v] * s / qtab[v * 8 + u])
        return out

    qtabs = {0: qlum, 1: qchrom}
    coeffs = {pname: {} for pname, *_ in comps}  # (bx,by) -> 64 ints
    for pname, cid, hi, vi, qid in comps:
        for by in range(mcuy * vi):
            for bx in range(mcux * hi):
                coeffs[pname][(bx, by)] = _fdct_quant(padded[pname], bx, by, qtabs[qid])

    # --- canonical fixed-length Huffman tables ---
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    ac_syms = sorted(set(ac_syms))  # 162 symbols (baseline)
    ac_syms_prog = sorted((r << 4) | s for r in range(16) for s in range(11))  # + EOBn
    dc_bits = [0] * 16
    dc_bits[3] = len(dc_syms)  # all length 4
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)  # all length 8
    ac_bits_prog = [0] * 16
    ac_bits_prog[7] = len(ac_syms_prog)

    return {
        "zzag": zzag, "qtabs": qtabs, "grey": grey, "ph": ph, "pw": pw,
        "comps": comps, "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
        "coeffs": coeffs,
        "dc_syms": dc_syms, "dc_bits": dc_bits,
        "dc_codes": {sym: (4, i) for i, sym in enumerate(dc_syms)},
        "ac_syms": ac_syms, "ac_bits": ac_bits,
        "ac_codes": {sym: (8, i) for i, sym in enumerate(ac_syms)},
        "ac_syms_prog": ac_syms_prog, "ac_bits_prog": ac_bits_prog,
        "ac_codes_prog": {sym: (8, i) for i, sym in enumerate(ac_syms_prog)},
    }


def _jpeg_headers(plan, sof_marker, restart_interval, progressive_ac=False):
    """SOI / APP0 / DQT / SOFn / DHT / DRI segment assembly (everything
    before the first SOS)."""
    zzag, qtabs, grey, comps = plan["zzag"], plan["qtabs"], plan["grey"], plan["comps"]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq in (0,) if grey else (0, 1):
        zzq = bytes(qtabs[tq][zzag[i]] for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([tq]) + zzq
    nc = len(comps)
    sof = bytearray(struct.pack(">BHHB", 8, plan["ph"], plan["pw"], nc))
    for pname, cid, hi, vi, qid in comps:
        sof += bytes([cid, (hi << 4) | vi, qid])
    out += bytes((0xFF, sof_marker)) + struct.pack(">H", 2 + len(sof)) + sof
    ac_tab = ("ac_bits_prog", "ac_syms_prog") if progressive_ac else ("ac_bits", "ac_syms")
    for tc, (bits_, syms) in ((0, (plan["dc_bits"], plan["dc_syms"])), (1, (plan[ac_tab[0]], plan[ac_tab[1]]))):
        for th in (0,) if grey else (0, 1):
            seg = bytes([(tc << 4) | th]) + bytes(bits_) + bytes(syms)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return out


def jpeg_bytes(px_rows, mode, restart_interval=0):
    """Independent baseline JFIF encoder + CCJpegRecon v1 expected
    pixels (multimodal.py's frozen reconstruction spec, re-derived
    here with scalar Python ints — no numpy, no shared code). Returns
    (payload, expected_rgb_rows) where expected is what ANY
    spec-conforming decoder must produce from these exact bytes —
    JPEG is lossy vs the input, but decode-of-encode is pinned by the
    spec. See :func:`_jpeg_plan` for modes and table construction."""
    plan = _jpeg_plan(px_rows, mode)
    zzag, comps, coeffs = plan["zzag"], plan["comps"], plan["coeffs"]
    mcux, mcuy = plan["mcux"], plan["mcuy"]
    dc_codes, ac_codes = plan["dc_codes"], plan["ac_codes"]
    grey = plan["grey"]

    # --- entropy encode (interleaved MCUs, byte stuffing, RSTn) ---
    wtr = _JpegBitWriter()
    dc_pred = {pname: 0 for pname, *_ in comps}
    rst_n = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            wtr.body.extend((0xFF, 0xD0 + rst_n % 8))
            rst_n += 1
            dc_pred = {pname: 0 for pname, *_ in comps}
        my, mx = divmod(m, mcux)
        for pname, cid, hi, vi, qid in comps:
            for by in range(vi):
                for bx in range(hi):
                    blk = coeffs[pname][(mx * hi + bx, my * vi + by)]
                    diff = blk[0] - dc_pred[pname]
                    dc_pred[pname] = blk[0]
                    size, bits = _jpeg_magnitude(diff)
                    ln, code = dc_codes[size]
                    wtr.emit(code, ln)
                    if size:
                        wtr.emit(bits, size)
                    zrun = 0
                    for k in range(1, 64):
                        val = blk[zzag[k]]
                        if val == 0:
                            zrun += 1
                            continue
                        while zrun >= 16:
                            ln, code = ac_codes[0xF0]
                            wtr.emit(code, ln)
                            zrun -= 16
                        size, bits = _jpeg_magnitude(val)
                        ln, code = ac_codes[(zrun << 4) | size]
                        wtr.emit(code, ln)
                        wtr.emit(bits, size)
                        zrun = 0
                    if zrun:
                        ln, code = ac_codes[0x00]
                        wtr.emit(code, ln)
    wtr.flush()

    out = _jpeg_headers(plan, 0xC0, restart_interval)
    nc = len(comps)
    sos = bytearray([nc])
    for pname, cid, hi, vi, qid in comps:
        td_ta = 0 if grey else (0 if pname == "Y" else 0x11)
        sos += bytes([cid, td_ta])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += wtr.body + b"\xff\xd9"
    return bytes(out), _jpeg_expected(plan)


def _jpeg_prog_scan(plan, scan_comps, ss, se, ah, al, restart_interval):
    """One progressive (SOF2) scan: returns (sos_segment, entropy_body).

    Implements the four Annex G scan families from the ENCODER side,
    independently of the decoder's transcription: DC first (diffs of
    the arithmetic-shifted DC), DC refinement (one raw bit per block),
    AC first over the spectral band [ss, se] with EOB-run accumulation
    (point transform truncates toward zero: shift of the magnitude),
    and AC refinement (G.1.2.3 — newly-significant coefficients as
    run-terminated ±1 symbols, buffered correction bits for
    already-significant ones, EOB runs carrying the buffered bits).
    Single-component scans walk the component's OWN block raster
    (ceil(ceil(w·hi/hmax)/8) wide); multi-component scans interleave
    MCUs. Restart markers flush the EOB run + bit buffer and reset DC
    predictions, exactly every ``restart_interval`` units.
    """
    zzag, comps, coeffs = plan["zzag"], plan["comps"], plan["coeffs"]
    mcux, mcuy = plan["mcux"], plan["mcuy"]
    hmax, vmax = plan["hmax"], plan["vmax"]
    pw, ph, grey = plan["pw"], plan["ph"], plan["grey"]
    dc_codes, ac_codes = plan["dc_codes"], plan["ac_codes_prog"]
    interleaved = len(scan_comps) > 1
    if interleaved:
        units = mcux * mcuy
        bw = bh = None
    else:
        pname, cid, hi, vi, qid = scan_comps[0]
        bw = -(-(-(-pw * hi // hmax)) // 8)
        bh = -(-(-(-ph * vi // vmax)) // 8)
        units = bw * bh

    def blocks_of(u):
        if interleaved:
            my, mx = divmod(u, mcux)
            for pname, cid, hi, vi, qid in scan_comps:
                for by in range(vi):
                    for bx in range(hi):
                        yield pname, mx * hi + bx, my * vi + by
        else:
            yield scan_comps[0][0], u % bw, u // bw

    wtr = _JpegBitWriter()
    dc_pred = {pname: 0 for pname, *_ in scan_comps}
    state = {"eobrun": 0, "pend": []}  # pend: correction bits owed to the run

    def flush_eobrun():
        if state["eobrun"] > 0:
            nbits = state["eobrun"].bit_length() - 1
            ln, code = ac_codes[nbits << 4]
            wtr.emit(code, ln)
            if nbits:
                wtr.emit(state["eobrun"] & ((1 << nbits) - 1), nbits)
            state["eobrun"] = 0
            for b in state["pend"]:
                wtr.emit(b, 1)
            state["pend"] = []

    rst_n = 0
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            flush_eobrun()
            wtr.flush()
            wtr.body.extend((0xFF, 0xD0 + rst_n % 8))
            rst_n += 1
            dc_pred = {pname: 0 for pname, *_ in scan_comps}
        for pname, bx, by in blocks_of(u):
            blk = coeffs[pname][(bx, by)]
            if ss == 0 and ah == 0:  # DC first (arithmetic shift by al)
                v = blk[0] >> al
                diff = v - dc_pred[pname]
                dc_pred[pname] = v
                size, bits = _jpeg_magnitude(diff)
                ln, code = dc_codes[size]
                wtr.emit(code, ln)
                if size:
                    wtr.emit(bits, size)
            elif ss == 0:  # DC refinement: bit al of the DC
                wtr.emit((blk[0] >> al) & 1, 1)
            elif ah == 0:  # AC first over [ss, se], toward-zero shift
                r = 0
                for k in range(ss, se + 1):
                    v = blk[zzag[k]]
                    t = (abs(v) >> al) * (1 if v >= 0 else -1)
                    if t == 0:
                        r += 1
                        continue
                    flush_eobrun()
                    while r > 15:
                        ln, code = ac_codes[0xF0]
                        wtr.emit(code, ln)
                        r -= 16
                    size, bits = _jpeg_magnitude(t)
                    ln, code = ac_codes[(r << 4) | size]
                    wtr.emit(code, ln)
                    wtr.emit(bits, size)
                    r = 0
                if r > 0:
                    state["eobrun"] += 1
                    if state["eobrun"] == 0x7FFF:
                        flush_eobrun()
            else:  # AC refinement (G.1.2.3)
                absv = {k: abs(blk[zzag[k]]) >> al for k in range(ss, se + 1)}
                eobpos = ss - 1
                for k in range(ss, se + 1):
                    if absv[k] == 1:
                        eobpos = k  # last NEWLY-significant coefficient
                r, br = 0, []
                for k in range(ss, se + 1):
                    t = absv[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eobpos:
                        flush_eobrun()
                        ln, code = ac_codes[0xF0]
                        wtr.emit(code, ln)
                        r -= 16
                        for b in br:
                            wtr.emit(b, 1)
                        br = []
                    if t > 1:  # already significant: one correction bit
                        br.append(t & 1)
                        continue
                    flush_eobrun()
                    ln, code = ac_codes[(r << 4) | 1]
                    wtr.emit(code, ln)
                    wtr.emit(1 if blk[zzag[k]] >= 0 else 0, 1)
                    for b in br:
                        wtr.emit(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    state["eobrun"] += 1
                    state["pend"].extend(br)
                    if state["eobrun"] == 0x7FFF or len(state["pend"]) > 900:
                        flush_eobrun()
    flush_eobrun()
    wtr.flush()

    sos = bytearray([len(scan_comps)])
    for pname, cid, hi, vi, qid in scan_comps:
        td_ta = 0 if grey else (0 if pname == "Y" else 0x11)
        sos += bytes([cid, td_ta])
    sos += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + bytes(sos), bytes(wtr.body)


def jpeg_progressive_bytes(px_rows, mode, restart_interval=0):
    """Independent PROGRESSIVE (SOF2) JFIF encoder + CCJpegRecon v1
    expected pixels — the same quantized coefficients and golden as
    :func:`jpeg_bytes`, shipped as a multi-scan stream exercising
    spectral selection (DC scan, AC band 1–5, AC band 6–63) AND
    successive approximation (everything first sent at Al=1, then a
    refinement pass at Ah=1/Al=0 for DC and both AC bands). A
    spec-conforming decoder must reconstruct the FULL-precision
    coefficients from the completed scan script, so the expected
    pixels are identical to the baseline container's — that identity
    is what pins the decoder's Annex G paths (EOB runs, ZRL-in-first,
    correction bits, non-interleaved block geometry when hi < hmax)."""
    plan = _jpeg_plan(px_rows, mode)
    comps = plan["comps"]
    out = _jpeg_headers(plan, 0xC2, restart_interval, progressive_ac=True)
    script = [(comps, 0, 0, 0, 1)]  # DC first, interleaved, Al=1
    for c in comps:  # AC first scans: two spectral bands per component
        script.append(([c], 1, 5, 0, 1))
        script.append(([c], 6, 63, 0, 1))
    script.append((comps, 0, 0, 1, 0))  # DC refinement
    for c in comps:  # AC refinement scans
        script.append(([c], 1, 5, 1, 0))
        script.append(([c], 6, 63, 1, 0))
    for scan_comps, ss, se, ah, al in script:
        sos, body = _jpeg_prog_scan(plan, scan_comps, ss, se, ah, al, restart_interval)
        out += sos + body
    out += b"\xff\xd9"
    return bytes(out), _jpeg_expected(plan)


def _jpeg_expected(plan):
    """Expected pixels per CCJpegRecon v1 (scalar ints) from the
    quantized coefficients — entropy-coding-agnostic, so baseline and
    progressive containers of the same plan share one golden."""
    comps, coeffs, qtabs = plan["comps"], plan["coeffs"], plan["qtabs"]
    mcux, mcuy = plan["mcux"], plan["mcuy"]
    hmax, vmax = plan["hmax"], plan["vmax"]
    ph, pw, grey = plan["ph"], plan["pw"], plan["grey"]

    def _clip8(v):
        return 0 if v < 0 else (255 if v > 255 else v)

    ict = [
        [
            round((1 << 14) * ((1 / (2 * math.sqrt(2))) if u == 0 else 0.5) * math.cos((2 * x + 1) * u * math.pi / 16))
            for x in range(8)
        ]
        for u in range(8)
    ]
    recon = {}
    for pname, cid, hi, vi, qid in comps:
        qtab = qtabs[qid]
        wpix, hpix = mcux * hi * 8, mcuy * vi * 8
        plane = [[0] * wpix for _ in range(hpix)]
        for (bx, by), blk in coeffs[pname].items():
            dq = [blk[i] * qtab[i] for i in range(64)]
            for y in range(8):
                for x in range(8):
                    s = 0
                    for v in range(8):
                        for u in range(8):
                            s += dq[v * 8 + u] * ict[v][y] * ict[u][x]
                    plane[by * 8 + y][bx * 8 + x] = _clip8(((s + (1 << 27)) >> 28) + 128)
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:
            plane = [
                [plane[y // fy][x // fx] for x in range(wpix * fx)]
                for y in range(hpix * fy)
            ]
        recon[pname] = [row[:pw] for row in plane[:ph]]
    expected = []
    if grey:
        for row in recon["Y"]:
            expected.append([(v, v, v) for v in row])
    else:
        for y in range(ph):
            erow = []
            for x in range(pw):
                yv = recon["Y"][y][x]
                cb_ = recon["Cb"][y][x] - 128
                cr_ = recon["Cr"][y][x] - 128
                erow.append(
                    (
                        _clip8(yv + ((91881 * cr_ + 32768) >> 16)),
                        _clip8(yv - ((22554 * cb_ + 46802 * cr_ + 32768) >> 16)),
                        _clip8(yv + ((116130 * cb_ + 32768) >> 16)),
                    )
                )
            expected.append(erow)
    return expected


def synth_dir(sf: float, root: str | Path = None) -> Path:
    root = Path(root) if root else Path(__file__).resolve().parent.parent / ".synthdata"
    return root / f"sf{sf}"


TABLES = [
    "pages",
    "surface_forms",
    "redirects",
    "disambiguations",
    "entity_types",
    "abstracts",
    "golden_text",
    "golden_pair_counts",
    "golden_uri_counts",
    "golden_sf_total_counts",
    "golden_token_counts",
    "golden_triples",
    "golden_mentions",
    "golden_paragraph_mentions",
    "article_categories",
    "skos_broader",
    "golden_dump_index",
    "golden_warc_pages",
    "golden_warc_cdx",
    "media",
    "golden_media_stats",
    "golden_audio_frames",
    "golden_image_dhash",
]


def _triples_frame(c: Corpus) -> pd.DataFrame:
    rows = []
    for (sf, uri), n in sorted(c.pair_counts.items()):
        rows.append((sf, "kg:linksTo", uri, n))
    for uri, n in sorted(c.uri_counts.items()):
        rows.append((uri, "kg:uriCount", str(n), n))
    for sf, n in sorted(c.annotated.items()):
        rows.append((sf, "kg:annotatedCount", str(n), n))
    for sf, n in sorted(c.sf_total.items()):
        rows.append((sf, "kg:totalCount", str(n), n))
    for (url, uri), n in sorted(c.mentions.items()):
        rows.append((url, "kg:mentions", uri, n))
    return pd.DataFrame(rows, columns=["subj", "pred", "obj", "weight"])


def generate(sf: float, root: str | Path = None, force: bool = False) -> Path:
    """Generate (or reuse cached) synthetic corpus parquet at scale sf."""
    out = synth_dir(sf, root)
    marker = out / "_SUCCESS"
    if marker.exists() and marker.read_text().strip() == GEN_VERSION and not force:
        return out
    out.mkdir(parents=True, exist_ok=True)
    c = Corpus(sf)

    pages = pd.DataFrame(
        {
            "url": [p.url for p in c.pages],
            "warc_ts": [c.base_ts + timedelta(seconds=7 * j) for j in range(len(c.pages))],
            "html": [p.html for p in c.pages],
            "text": [p.text for p in c.pages],
            "lang": [p.lang for p in c.pages],
        }
    )
    frames = {"pages": pages}

    sf_rows = []
    for k in range(c.n_entities):
        title = _entity_title(k)
        uri = uri_encode(c.resolve_title(title), URI_LANG)
        # surfaces_by_title includes the contested shared surfaces, so
        # an ambiguous surface gets one dimension row PER candidate uri
        for sf_ in c.surfaces_by_title[title]:
            total = c.sf_total.get(sf_, -1)
            occ = total if total > 0 else max(c.annotated.get(sf_, 0), 1)
            # per-(sf, uri) anchor count where observed (distinguishes
            # the two candidates of a contested surface); fall back to
            # the surface total for never-linked dictionary entries
            anchor = c.pair_counts.get((sf_, uri), c.annotated.get(sf_, 0))
            sf_rows.append((sf_, uri, anchor, occ))
    frames["surface_forms"] = pd.DataFrame(
        sf_rows, columns=["surface_form", "uri", "anchor_count", "occurrence_count"]
    ).drop_duplicates(subset=["surface_form", "uri"])

    frames["redirects"] = pd.DataFrame(
        [(uri_encode(s, URI_LANG), uri_encode(d, URI_LANG)) for s, d in sorted(c.redirects.items())],
        columns=["src_uri", "dst_uri"],
    )
    frames["disambiguations"] = pd.DataFrame(
        [(uri_encode(d, URI_LANG), uri_encode(cand, URI_LANG)) for d, cands in sorted(c.dabs.items()) for cand in cands],
        columns=["dab_uri", "candidate_uri"],
    )
    frames["entity_types"] = pd.DataFrame(
        [(uri_encode(_entity_title(k), URI_LANG), TYPES[k % len(TYPES)]) for k in range(c.n_entities)],
        columns=["uri", "type"],
    )
    frames["abstracts"] = pd.DataFrame(
        [
            (
                uri_encode(_entity_title(k), URI_LANG),
                f"{_entity_title(k).replace('_', ' ')} is a {TYPES[k % len(TYPES)].lower()}.",
            )
            for k in range(c.n_entities)
        ],
        columns=["uri", "abstract"],
    )
    frames["golden_text"] = pages[["url", "text"]].copy()
    frames["golden_pair_counts"] = pd.DataFrame(
        [(s, u, n) for (s, u), n in sorted(c.pair_counts.items())], columns=["surface_form", "uri", "cnt"]
    )
    frames["golden_uri_counts"] = pd.DataFrame(
        [(u, n) for u, n in sorted(c.uri_counts.items())], columns=["uri", "cnt"]
    )
    frames["golden_sf_total_counts"] = pd.DataFrame(
        [(s, c.annotated[s], t) for s, t in sorted(c.sf_total.items())],
        columns=["surface_form", "annotated_cnt", "total_cnt"],
    )
    frames["golden_token_counts"] = pd.DataFrame(
        [(u, t, n) for (u, t), n in sorted(c.token_counts.items())], columns=["uri", "token", "cnt"]
    )
    frames["golden_triples"] = _triples_frame(c)
    frames["golden_mentions"] = pd.DataFrame(
        [(u, ctx, s, uri, n) for (u, ctx, s, uri), n in sorted(c.ctx_mentions.items())],
        columns=["url", "context", "surface_form", "uri", "cnt"],
    )
    frames["golden_paragraph_mentions"] = pd.DataFrame(
        [(u, ctx, s, uri, n) for (u, ctx, s, uri), n in sorted(c.para_mentions.items())],
        columns=["url", "context", "surface_form", "uri", "cnt"],
    )

    # --- topic-corpus side tables (SURVEY.md §2.3 topic scripts) ---
    n_cats = max(5, c.n_entities // 8)
    cat_rows = []
    for k in range(c.n_entities):
        uri = uri_encode(_entity_title(k), URI_LANG)
        cat_rows.append((uri, f"Cat_{k % n_cats}"))
        if k % 5 == 0:  # some articles carry two categories
            cat_rows.append((uri, f"Cat_{(k * 3 + 1) % n_cats}"))
    frames["article_categories"] = pd.DataFrame(cat_rows, columns=["uri", "category"])
    broader_rows = [(f"Cat_{i}", f"Cat_{i // 3}") for i in range(1, n_cats)]
    broader_rows.append(("Cat_0", f"Cat_{n_cats - 1}"))  # deliberate cycle
    frames["skos_broader"] = pd.DataFrame(broader_rows, columns=["category", "parent"])

    # --- Wikipedia-dump replay fixture (J1/J2 parity): two XML shards
    #     + NTriples files (J4 parity) ---
    def _dump_title(idx: int, p: PagePlan) -> str:
        return f"Page {idx} {p.kind}"

    import xml.sax.saxutils as sx

    shards = [[], []]
    dump_index = []
    for idx, p in enumerate(c.pages):
        title = _dump_title(idx, p)
        markup = p.html.decode("utf-8", errors="replace")
        shards[idx % 2].append(
            "  <page>\n"
            f"    <title>{sx.escape(title)}</title>\n"
            f"    <id>{idx}</id>\n"
            "    <revision>\n"
            f"      <text>{sx.escape(markup)}</text>\n"
            "    </revision>\n"
            "  </page>"
        )
        dump_index.append((title, idx, len(p.html)))
    frames["golden_dump_index"] = pd.DataFrame(dump_index, columns=["title", "page_id", "markup_bytes"])
    dump_dir = out / "dump"
    dump_dir.mkdir(exist_ok=True)
    for si, pages_xml in enumerate(shards):
        body = "<mediawiki>\n" + "\n".join(pages_xml) + "\n</mediawiki>\n"
        (dump_dir / f"part-{si}.xml").write_text(body, encoding="utf-8")

    nt_dir = out / "nt"
    nt_dir.mkdir(exist_ok=True)
    red_prop = "http://dbpedia.org/ontology/wikiPageRedirects"
    with open(nt_dir / "redirects.nt", "w") as f:
        f.write("# synthetic redirects dump\n")
        for s, d in sorted(c.redirects.items()):
            f.write(f"<{uri_encode(s, URI_LANG)}> <{red_prop}> <{uri_encode(d, URI_LANG)}> .\n")
        f.write("malformed line without triple structure\n")
    abs_prop = "http://dbpedia.org/ontology/abstract"
    with open(nt_dir / "abstracts.nt", "w") as f:
        for _, row in frames["abstracts"].iterrows():
            lit = row["abstract"].replace("\\", "\\\\").replace('"', '\\"')
            f.write(f'<{row["uri"]}> <{abs_prop}> "{lit}"@en .\n')

    # --- Common-Crawl-style .warc.gz replay fixture (J1 parity for the
    #     web-crawl input model, SURVEY.md §1.3): every record its own
    #     gzip member (the CC layout), two shard files, warcinfo +
    #     request members interleaved so the reader's response filter is
    #     exercised. Goldens (golden_warc_pages / golden_warc_cdx) are
    #     computed HERE from the page plan — an independent code path
    #     from sources/warc.py's parser, same byte-identity discipline
    #     as golden_dump_index.
    import gzip as _gzip
    import hashlib as _hashlib

    warc_dir = out / "warc"
    warc_dir.mkdir(exist_ok=True)

    def _warc_member(headers: list[tuple[str, str]], body: bytes) -> bytes:
        head = "".join(f"{k}: {v}\r\n" for k, v in headers)
        rec = (
            b"WARC/1.0\r\n"
            + head.encode("utf-8")
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
            + b"\r\n\r\n"
        )
        return _gzip.compress(rec, mtime=0)  # fixed mtime → deterministic bytes

    # fixture value saturates well below full corpus size: cap the
    # member count so large-sf generation (sf4.0 = 2M pages for the
    # scaling runs) doesn't spend minutes gzipping a per-page archive
    # nobody replays at that scale. Small sf (≤ 0.2) is unaffected, so
    # the driver-oracle goldens at sf0.01 are identical with/without
    # the cap.
    WARC_FIXTURE_CAP = 100_000
    warc_pages = c.pages[:WARC_FIXTURE_CAP]
    shard_paths = [warc_dir / f"part-{si}.warc.gz" for si in range(2)]
    shard_bufs: list[list[bytes]] = [[], []]
    shard_offsets = [0, 0]
    warc_golden = []
    cdx_rows = []
    for si in range(2):
        info = _warc_member(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Date", "2024-01-01T00:00:00Z"),
                ("Content-Type", "application/warc-fields"),
            ],
            b"software: pignlproc_spark synth\r\n",
        )
        shard_bufs[si].append(info)
        shard_offsets[si] += len(info)
    for idx, p in enumerate(warc_pages):
        si = idx % 2
        ts = c.base_ts + timedelta(seconds=7 * idx)
        date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        if idx % 7 == 3:  # interleave a request record (readers must skip it)
            req = _warc_member(
                [
                    ("WARC-Type", "request"),
                    ("WARC-Target-URI", p.url),
                    ("WARC-Date", date),
                ],
                f"GET {p.url} HTTP/1.1\r\nHost: synth\r\n\r\n".encode(),
            )
            shard_bufs[si].append(req)
            shard_offsets[si] += len(req)
        status, ctype = (404, "text/plain") if idx % 97 == 3 else (200, "text/html")
        http = (
            f"HTTP/1.1 {status} {'OK' if status == 200 else 'Not Found'}\r\n"
            f"Content-Type: {ctype}; charset=utf-8\r\n"
            f"Content-Length: {len(p.html)}\r\n\r\n"
        ).encode() + p.html
        resp = _warc_member(
            [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", p.url),
                ("WARC-Date", date),
            ],
            http,
        )
        cdx_rows.append((str(shard_paths[si]), shard_offsets[si], len(resp), p.url))
        shard_bufs[si].append(resp)
        shard_offsets[si] += len(resp)
        epoch = int((ts - datetime(1970, 1, 1)).total_seconds())
        warc_golden.append(
            (p.url, epoch, status, ctype, len(p.html), _hashlib.md5(p.html).hexdigest())
        )
    for si, wpath in enumerate(shard_paths):
        wpath.write_bytes(b"".join(shard_bufs[si]))
    frames["golden_warc_pages"] = pd.DataFrame(
        warc_golden,
        columns=["url", "ts_epoch", "http_status", "content_type", "payload_bytes", "payload_md5"],
    )
    frames["golden_warc_cdx"] = pd.DataFrame(
        cdx_rows, columns=["path", "offset", "length", "url"]
    )

    # --- multimodal media fixture: REAL 24-bpp BMP + PNG + PCM WAV
    #     payloads and a plan-derived integer-stats golden. The encoders
    #     here are deliberately independent of operators/multimodal.py
    #     (pure struct-packing BMP writer, a from-scratch PNG filter
    #     encoder + stdlib zlib, the stdlib `wave` module), so an
    #     encode/decode bug pair cannot cancel out. -1 = not-applicable
    #     (the engine's established left-outer fill convention).
    import io as _io
    import struct as _struct
    import wave as _wave
    import zlib as _zlib

    def _bmp_bytes(px_rows):  # px_rows: list[list[(r, g, b)]], row 0 = top
        bh, bw = len(px_rows), len(px_rows[0])
        row_size = (3 * bw + 3) // 4 * 4
        pad = b"\x00" * (row_size - 3 * bw)
        body = b"".join(
            b"".join(bytes((b_, g_, r_)) for r_, g_, b_ in row) + pad
            for row in reversed(px_rows)  # BMP stores bottom-up, BGR
        )
        hdr = b"BM" + _struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        hdr += _struct.pack("<IiiHHIIiiII", 40, bw, bh, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        return hdr + body

    def _png_bytes(px_rows, color_type):
        """Independent PNG encoder (RFC 2083): px_rows of per-pixel
        tuples sized to the color type's channel count; row y is
        filtered with type y % 5 so every decoder filter path
        (None/Sub/Up/Average/Paeth) is exercised by the golden."""
        nch = {0: 1, 2: 3, 6: 4}[color_type]
        ph, pw = len(px_rows), len(px_rows[0])

        def chunk(ctype, body):
            return (
                _struct.pack(">I", len(body)) + ctype + body
                + _struct.pack(">I", _zlib.crc32(ctype + body))
            )

        raw = bytearray()
        prev = [0] * (pw * nch)
        for y, row in enumerate(px_rows):
            cur = [c for pxl in row for c in pxl]
            f = y % 5
            raw.append(f)
            for x in range(len(cur)):
                a = cur[x - nch] if x >= nch else 0
                b_ = prev[x]
                c0 = prev[x - nch] if x >= nch else 0
                if f == 0:
                    v = cur[x]
                elif f == 1:
                    v = cur[x] - a
                elif f == 2:
                    v = cur[x] - b_
                elif f == 3:
                    v = cur[x] - (a + b_) // 2
                else:
                    p = a + b_ - c0
                    pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c0)
                    pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c0)
                    v = cur[x] - pred
                raw.append(v % 256)
            prev = cur
        ihdr = _struct.pack(">IIBBBBB", pw, ph, 8, color_type, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    n_media = max(48, int(1200 * sf))
    media_rows, media_stats_rows, audio_frame_rows = [], [], []
    dhash_src, bmp_twin_src = [], []

    def _plan_dhash(px_rgb):
        # CCDHash v1 replayed in pure python from the plan's pixel
        # lists (independent of the operator's numpy path): integer
        # luma, 9x8 nearest-neighbor grid, left>right bits, hex
        H, W = len(px_rgb), len(px_rgb[0])
        luma = [[(299 * r + 587 * g + 114 * b) // 1000 for (r, g, b) in row] for row in px_rgb]
        xs = [(j * W) // 9 for j in range(9)]
        ys = [(i_ * H) // 8 for i_ in range(8)]
        h = 0
        for y in range(8):
            for x in range(8):
                if luma[ys[y]][xs[x]] > luma[ys[y]][xs[x + 1]]:
                    h |= 1 << (y * 8 + x)
        return format(h, "016x")
    for i in range(n_media):
        mrng = random.Random(f"{SEED}:media:{i}")
        murl = f"https://media.example/{i}"
        if i % 4 == 3:  # image: PNG (cycling grey/RGB/RGBA, all filters)
            color_type = (0, 2, 6)[(i // 4) % 3]
            nch = {0: 1, 2: 3, 6: 4}[color_type]
            pw = 3 + mrng.randrange(10)
            ph = 5 + mrng.randrange(8)  # ≥5 rows → every filter type used
            px = [
                [tuple(mrng.randrange(256) for _ in range(nch)) for _ in range(pw)]
                for _ in range(ph)
            ]
            payload = _png_bytes(px, color_type)
            flat = [c for row in px for c in row]
            if color_type == 0:  # grey replicates to RGB in the decoder
                sr = sg = sb = sum(c[0] for c in flat)
            else:  # RGBA: alpha dropped, sums over the RGB bytes
                sr = sum(c[0] for c in flat)
                sg = sum(c[1] for c in flat)
                sb = sum(c[2] for c in flat)
            media_rows.append((murl, "image", payload, pw, ph, None))
            media_stats_rows.append(
                (murl, "image", len(payload), 1, pw, ph, pw * ph, sr, sg, sb,
                 -1, -1, -1, -1)
            )
            rgb = [
                [((c[0],) * 3 if color_type == 0 else c[:3]) for c in row]
                for row in px
            ]
            dhash_src.append((murl, rgb))
        elif i % 3 == 0:  # image: 24-bpp BMP, varying dims incl. row padding
            bw = 4 + mrng.randrange(12)
            bh = 3 + mrng.randrange(10)
            px = [
                [(mrng.randrange(256), mrng.randrange(256), mrng.randrange(256)) for _ in range(bw)]
                for _ in range(bh)
            ]
            payload = _bmp_bytes(px)
            flat = [c for row in px for c in row]
            media_rows.append((murl, "image", payload, bw, bh, None))
            media_stats_rows.append(
                (murl, "image", len(payload), 1, bw, bh, bw * bh,
                 sum(c[0] for c in flat), sum(c[1] for c in flat), sum(c[2] for c in flat),
                 -1, -1, -1, -1)
            )
            dhash_src.append((murl, px))
            if i % 12 == 0:
                bmp_twin_src.append((i, px))
        elif i % 3 == 1:  # audio: PCM WAV (8-bit mono / 16-bit mono or stereo)
            rate = (8000, 16000, 22050)[(i // 3) % 3]
            n_s = 40 + mrng.randrange(160)
            eight_bit = i % 9 == 4
            stereo = (not eight_bit) and i % 15 == 1
            if eight_bit:
                vals = [mrng.randrange(256) for _ in range(n_s)]
                nch, sampwidth, payload_frames = 1, 1, bytes(vals)
                ch0 = [v - 128 for v in vals]
            else:
                nch, sampwidth = (2 if stereo else 1), 2
                vals = [mrng.randrange(-3000, 3000) for _ in range(n_s * nch)]
                payload_frames = b"".join(_struct.pack("<h", v) for v in vals)
                ch0 = vals[::nch]
            bio = _io.BytesIO()
            with _wave.open(bio, "wb") as wv:
                wv.setnchannels(nch)
                wv.setsampwidth(sampwidth)
                wv.setframerate(rate)
                wv.writeframes(payload_frames)
            payload = bio.getvalue()
            zc = sum(1 for a, b_ in zip(ch0, ch0[1:]) if (a < 0) != (b_ < 0))
            media_rows.append((murl, "audio", payload, None, None, int(1000 * n_s / rate)))
            media_stats_rows.append(
                (murl, "audio", len(payload), 1, -1, -1, -1, -1, -1, -1,
                 rate, n_s, sum(abs(v) for v in ch0), zc)
            )
            # CCAudioFrames v1 golden from the plan's ch0 (pure-python
            # path, independent of the operator's numpy striding):
            # frame 32 / hop 16, frames fully inside the clip only
            _fr, _hp = 32, 16
            for _f in range((n_s - _fr) // _hp + 1 if n_s >= _fr else 0):
                _w = ch0[_f * _hp : _f * _hp + _fr]
                audio_frame_rows.append(
                    (murl, _f, _f * _hp,
                     sum(v * v for v in _w),
                     sum(abs(v) for v in _w),
                     sum(1 for a, b_ in zip(_w, _w[1:]) if (a < 0) != (b_ < 0)),
                     max(abs(v) for v in _w))
                )
        elif i % 24 in (2, 8, 17, 5, 14):  # image: JPEG — baseline (444/420/grey
            # × DRI) on slots 2/8/17, PROGRESSIVE (SOF2, spectral selection +
            # successive approximation) on slots 5/14; same CCJpegRecon v1 golden
            prog = i % 24 in (5, 14)
            if i % 24 == 5:
                mode = ("444", "grey")[(i // 24) % 2]
            elif i % 24 == 14:
                mode = "420"
            else:
                mode = {2: "444", 8: "420", 17: "grey"}[i % 24]
            rst = 2 if (i // 24) % 2 else 0
            pw = 9 + mrng.randrange(16)
            ph = 7 + mrng.randrange(14)  # non-multiples of 8/16 → pad+crop paths
            nch = 1 if mode == "grey" else 3
            px = [
                [tuple(mrng.randrange(256) for _ in range(nch)) for _ in range(pw)]
                for _ in range(ph)
            ]
            enc = jpeg_progressive_bytes if prog else jpeg_bytes
            payload, expected = enc(px, mode, restart_interval=rst)
            # golden sums over the CCJpegRecon v1 expected pixels — the
            # spec-pinned decode-of-encode output, NOT the (lossy) input
            sr = sum(p[0] for row in expected for p in row)
            sg = sum(p[1] for row in expected for p in row)
            sb = sum(p[2] for row in expected for p in row)
            media_rows.append((murl, "image", payload, pw, ph, None))
            media_stats_rows.append(
                (murl, "image", len(payload), 1, pw, ph, pw * ph, sr, sg, sb,
                 -1, -1, -1, -1)
            )
            dhash_src.append((murl, [list(row) for row in expected]))
        else:  # video: opaque payload no dependency-free codec can read
            payload = _hashlib.md5(f"video:{i}".encode()).digest() * (3 + i % 5)
            media_rows.append((murl, "video", payload, None, None, 1000 * (1 + i % 20)))
            media_stats_rows.append(
                (murl, "video", len(payload), 0, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1)
            )
    # perceptual twins: the SAME plan pixels shipped in a second
    # container (PNG for a BMP original) -> identical CCDHash, the
    # planted cross-format near-dup pair; plus a one-pixel-perturbed
    # BMP copy whose hamming distance the golden decides. No new RNG:
    # both derive arithmetically from already-generated pixels.
    for ti, px in bmp_twin_src:
        h_, w_ = len(px), len(px[0])
        flat = [c for row in px for c in row]
        turl = f"https://media.example/{ti}/twin"
        tpayload = _png_bytes(px, 2)
        media_rows.append((turl, "image", tpayload, w_, h_, None))
        media_stats_rows.append(
            (turl, "image", len(tpayload), 1, w_, h_, w_ * h_,
             sum(c[0] for c in flat), sum(c[1] for c in flat), sum(c[2] for c in flat),
             -1, -1, -1, -1)
        )
        dhash_src.append((turl, px))
        px_n = [list(row) for row in px]
        r0, g0, b0 = px_n[0][0]
        px_n[0][0] = (min(255, r0 + 16), g0, b0)
        nflat = [c for row in px_n for c in row]
        nurl = f"https://media.example/{ti}/near"
        npayload = _bmp_bytes(px_n)
        media_rows.append((nurl, "image", npayload, w_, h_, None))
        media_stats_rows.append(
            (nurl, "image", len(npayload), 1, w_, h_, w_ * h_,
             sum(c[0] for c in nflat), sum(c[1] for c in nflat), sum(c[2] for c in nflat),
             -1, -1, -1, -1)
        )
        dhash_src.append((nurl, px_n))
    # LOSSY cross-container twins: a smooth-gradient BMP and the SAME
    # pixels re-encoded as JPEG (baseline AND progressive) — pins
    # jobs/dedup_media.py's claim that CCDHash survives JPEG
    # quantization noise. dhash keys on 9x8 resampled luma
    # DIFFERENCES, which are large on a gradient (~ slope x cell
    # width) while quantization error on smooth content stays a few
    # units, so the planted pair must land inside the banding recall
    # bound; the golden (computed from the CCJpegRecon v1 expected
    # pixels) decides the exact hamming. Deterministic, no RNG.
    if n_media >= 12:
        for gi, (jenc, jtag) in enumerate(
            ((jpeg_bytes, "jpeg"), (jpeg_progressive_bytes, "jpeg-prog"))
        ):
            gw, gh = 24 + 8 * gi, 18 + 6 * gi
            gpx = [
                [
                    (
                        min(255, 16 + (176 * x) // gw + (24 * y) // gh),
                        min(255, 24 + (160 * x) // gw + (32 * y) // gh),
                        min(255, 8 + (144 * x) // gw + (16 * y) // gh),
                    )
                    for x in range(gw)
                ]
                for y in range(gh)
            ]
            gurl = f"https://media.example/grad{gi}"
            gpayload = _bmp_bytes(gpx)
            gflat = [c for row in gpx for c in row]
            media_rows.append((gurl, "image", gpayload, gw, gh, None))
            media_stats_rows.append(
                (gurl, "image", len(gpayload), 1, gw, gh, gw * gh,
                 sum(c[0] for c in gflat), sum(c[1] for c in gflat),
                 sum(c[2] for c in gflat), -1, -1, -1, -1)
            )
            dhash_src.append((gurl, gpx))
            jpayload, jexp = jenc(gpx, "444")
            jurl = f"{gurl}/{jtag}twin"
            jflat = [c for row in jexp for c in row]
            media_rows.append((jurl, "image", jpayload, gw, gh, None))
            media_stats_rows.append(
                (jurl, "image", len(jpayload), 1, gw, gh, gw * gh,
                 sum(c[0] for c in jflat), sum(c[1] for c in jflat),
                 sum(c[2] for c in jflat), -1, -1, -1, -1)
            )
            dhash_src.append((jurl, [list(row) for row in jexp]))

    frames["media"] = pd.DataFrame(
        media_rows, columns=["url", "kind", "payload", "width", "height", "duration_ms"]
    )
    frames["golden_media_stats"] = pd.DataFrame(
        media_stats_rows,
        columns=["url", "kind", "n_bytes", "decoded", "width", "height", "n_pixels",
                 "sum_r", "sum_g", "sum_b", "sample_rate", "n_samples", "sum_abs",
                 "zero_crossings"],
    )
    frames["golden_image_dhash"] = pd.DataFrame(
        [(u, _plan_dhash(px)) for u, px in dhash_src],
        columns=["url", "dhash"],
    )
    frames["golden_audio_frames"] = pd.DataFrame(
        audio_frame_rows,
        columns=["url", "frame_idx", "frame_start", "energy", "sum_abs",
                 "zero_crossings", "peak"],
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    for name, frame in frames.items():
        schema = None
        if name == "pages":
            schema = pa.schema(
                [
                    ("url", pa.string()),
                    ("warc_ts", pa.timestamp("us")),
                    ("html", pa.binary()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                ]
            )
        table = pa.Table.from_pandas(frame, schema=schema, preserve_index=False)
        # pages: small row groups so Spark's scan splits parallelize the
        # CPU-bound parse even from a single file (a real corpus would
        # arrive as many files; locally maxPartitionBytes + row groups
        # stand in for that)
        rgs = 2000 if name == "pages" else 10_000_000
        pq.write_table(table, out / f"{name}.parquet", row_group_size=rgs)
    marker.write_text(GEN_VERSION + "\n")
    return out


def sf_of_dir(sf_dir: str) -> float:
    """Extract scale factor from a '/root/testdata/sf0.01'-style path."""
    name = Path(sf_dir).name
    return float(name[2:]) if name.startswith("sf") else 0.001


def pages_for(spark, sf_dir: str):
    """Synthetic pages DataFrame matched to the driver's sf dir scale."""
    out = generate(sf_of_dir(sf_dir))
    return spark.read.parquet(str(out / "pages.parquet"))


def side_table(spark, sf_dir: str, name: str):
    out = generate(sf_of_dir(sf_dir))
    return spark.read.parquet(str(out / f"{name}.parquet"))


if __name__ == "__main__":
    import sys

    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.001
    path = generate(sf, force="--force" in sys.argv)
    print(path)
