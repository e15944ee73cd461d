"""Deterministic synthetic fixtures — pure functions of (seed, scale).

Generates the FIXTURES.md tables: ``transcripts`` (Zipf-skewed, shuffled,
duplicate-injected, pattern-bearing), ``entity_dictionary`` (broadcast
linking target), and ``alias_edges`` (chains + a cycle so connected
components is genuinely transitive). No wall-clock, no external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Entity dictionary — canonical ids in the reference NodeID grammar
# (pydanticModels.py:16-69), bluebook citations per scrapeECFR.py:1174-1210.
# ---------------------------------------------------------------------------

_CAL_CODES = ["bpc", "veh", "pen", "gov"]


def make_entity_dictionary() -> pd.DataFrame:
    rows = []
    # eCFR: titles 1..50, parts 100..120 step 5 (exact-match targets)
    for title in range(1, 51):
        rows.append(
            {
                "entity_id": f"us/federal/ecfr/title={title}",
                "entity_type": "statute",
                "canonical_citation": f"{title} CFR",
                "aliases": [f"cfr/title={title}"],
                "link": f"https://ex.gov/cfr/title-{title}",
            }
        )
        for part in range(100, 125, 5):
            rows.append(
                {
                    "entity_id": f"us/federal/ecfr/title={title}/part={part}",
                    "entity_type": "section",
                    "canonical_citation": f"{title} CFR Part {part}",
                    "aliases": [
                        f"cfr/title={title}/part={part}",
                        f"url/https://ex.gov/title-{title}/part-{part}",
                    ],
                    "link": f"https://ex.gov/title-{title}/part-{part}",
                }
            )
    # USC: titles 1..54, sections stored ZERO-PADDED to 3 digits — mentions
    # say "§ 5", so only the zero-pad rung of the candidate ladder links them
    # (reference pads section numbers on miss, pydanticModels.py:607-618).
    for title in range(1, 55):
        rows.append(
            {
                "entity_id": f"us/federal/usc/title={title}",
                "entity_type": "statute",
                "canonical_citation": f"{title} U.S.C.",
                "aliases": [f"usc/title={title}"],
                "link": f"https://ex.gov/usc/title-{title}",
            }
        )
        for sec in range(1, 30, 3):
            rows.append(
                {
                    "entity_id": f"us/federal/usc/title={title}/section={sec:03d}",
                    "entity_type": "section",
                    "canonical_citation": f"{title} U.S.C. § {sec}",
                    "aliases": [f"usc/title={title}/section={sec:03d}"],
                    "link": f"https://ex.gov/usc/title-{title}/sec-{sec}",
                }
            )
    # California codes
    for code in _CAL_CODES:
        rows.append(
            {
                "entity_id": f"us/ca/{code}",
                "entity_type": "statute",
                "canonical_citation": f"Cal. {code.upper()}",
                "aliases": [f"ca/code={code}"],
                "link": f"https://ex.gov/ca/{code}",
            }
        )
        for sec in range(100, 130, 5):
            rows.append(
                {
                    "entity_id": f"us/ca/{code}/section={sec}",
                    "entity_type": "section",
                    "canonical_citation": f"Cal. {code.upper()} § {sec}",
                    "aliases": [f"ca/code={code}/section={sec}"],
                    "link": f"https://ex.gov/ca/{code}/sec-{sec}",
                }
            )
    # Agencies (north_star entity class)
    for i, name in enumerate(["epa", "fda", "faa", "sec", "ftc"]):
        rows.append(
            {
                "entity_id": f"us/federal/agency={name}",
                "entity_type": "agency",
                "canonical_citation": name.upper(),
                "aliases": [f"url/https://ex.gov/agency/{name}"],
                "link": f"https://ex.gov/agency/{name}",
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Turn-text templates. Each template is a pure function of the seeded RNG
# draw; together they exercise every SURVEY §2 extraction operator.
# ---------------------------------------------------------------------------

_TERMS = [
    "Administrator",
    "Act",
    "Motor vehicle",
    "Sound level",
    "Person",
    "State agency",
    "Compliance date",
    "Operator",
]

_DIRTY = [
    lambda s: s.replace(" ", "\xa0", 1),
    lambda s: s.replace(". ", ".\r\n", 1),
    lambda s: s.replace(" the ", "  the  ", 1),
    lambda s: "<i>" + s + "</i>",
    lambda s: s.replace("-", "—", 1) if "-" in s else s + " — noted",
    lambda s: s,
]


def _gen_conv_turns(rng: np.random.RandomState, conv_id: str, n_turns: int) -> list[dict]:
    """One conversation: hierarchy headings interleaved with definition
    blocks, citation chatter, reserved markers, and dirty text."""
    turns: list[str] = []
    roles: list[str] = []
    tools: list[str] = []
    title_no = int(rng.randint(1, 50))
    chapter_no = 0
    section_no = 0
    in_defs = False
    for i in range(n_turns):
        draw = rng.rand()
        role = ["user", "assistant", "tool", "system"][int(rng.randint(0, 4))]
        tool = None
        if draw < 0.06:
            title_no = int(rng.randint(1, 50))
            chapter_no = 0
            section_no = 0
            text = f"Title {title_no}. Environmental Programs"
            in_defs = False
        elif draw < 0.14:
            chapter_no += 1
            section_no = 0
            text = f"Chapter {chapter_no}: General Provisions"
            in_defs = False
        elif draw < 0.30:
            section_no += 1
            name = "Scope and purpose"
            r2 = rng.rand()
            if r2 < 0.08:
                name = "[Reserved]"
            elif r2 < 0.12:
                name = "REPEALED by Stats. 1998"
            elif r2 < 0.16:
                name = "[Renumbered to 42]"
            text = f"Section {chapter_no or 1}.{section_no} {name}"
            in_defs = False
        elif draw < 0.36:
            text = "Definitions. As used in this part:"
            in_defs = True
        elif in_defs and draw < 0.50:
            term = _TERMS[int(rng.randint(0, len(_TERMS)))]
            body = f"any device capable of operation as described in part {int(rng.randint(1, 99))}"
            kind = rng.rand()
            if kind < 0.4:
                text = f"“{term}” means {body}."
            elif kind < 0.55:
                t2 = int(rng.randint(1, 55))
                s2 = int(rng.randint(1, 30))
                text = f"The term “{term}” has the meaning as defined in {t2} U.S.C. § {s2}."
            elif kind < 0.8:
                text = f"{term}. {body.capitalize()}."
            else:
                # nested (sub)definitions: '(1)'/'(2)' markers hang the
                # following quoted defs one level under the lead term
                s1 = _TERMS[int(rng.randint(0, len(_TERMS)))]
                s2 = _TERMS[int(rng.randint(0, len(_TERMS)))]
                text = (
                    f"“{term}” means {body}, including: "
                    f"(1) “{s1}” means the {s1.lower()} as configured; "
                    f"(2) “{s2}” means the {s2.lower()} in active service."
                )
        elif draw < 0.62:
            t = int(rng.randint(1, 51))
            p = 100 + 5 * int(rng.randint(0, 5))
            text = f"Per {t} CFR Part {p}, the requirement applies to all operators."
        elif draw < 0.70:
            t = int(rng.randint(1, 55))
            s = int(rng.randint(1, 30))
            text = f"See {t} U.S.C. § {s} for the statutory basis."
        elif draw < 0.76:
            code = _CAL_CODES[int(rng.randint(0, len(_CAL_CODES)))]
            s = 100 + 5 * int(rng.randint(0, 6))
            text = f"Under Cal. {code.upper()} § {s} the licensee shall comply."
        elif draw < 0.82:
            t = int(rng.randint(1, 51))
            p = 100 + 5 * int(rng.randint(0, 5))
            if rng.rand() < 0.7:
                # addendum trailer (source form); its URL still enters the
                # mention stream
                text = f"Source: https://ex.gov/title-{t}/part-{p} (accessed earlier)."
                role = "tool"
                tool = "web_fetch"
            else:
                # addendum trailer (history form) with a linkable citation
                ts = int(rng.randint(1, 55))
                ss = int(rng.randint(1, 30))
                text = f"History: Amended per {ts} U.S.C. § {ss}, effective as noted."
        else:
            fillers = [
                "Could you summarize the compliance obligations discussed above?",
                "The analysis shows the operator met the sound level requirement.",
                "Let me look that up for you and report back with citations.",
                "That interpretation is consistent with the agency guidance.",
            ]
            text = fillers[int(rng.randint(0, len(fillers)))]
        # dirty-text injection (tests the clean_text analog)
        text = _DIRTY[int(rng.randint(0, len(_DIRTY)))](text)
        turns.append(text)
        roles.append(role)
        tools.append(tool)
    return [
        {
            "conv_id": conv_id,
            "turn_idx": i,
            "role": roles[i],
            "text": turns[i],
            "tool": tools[i],
        }
        for i in range(n_turns)
    ]


def make_transcripts(
    seed: int = 42,
    n_turns_target: int = 2000,
    hot_fraction: float = 0.10,
    dup_fraction: float = 0.01,
) -> pd.DataFrame:
    """Deterministic transcripts table (pandas), shuffled row order.

    - one hot conversation holds ~``hot_fraction`` of all turns (skew test);
    - remaining conversations have Zipf-distributed lengths;
    - ~``dup_fraction`` of rows are exact (conv_id, turn_idx) duplicates;
    - rows are emitted in shuffled order (the engine must restore order).
    """
    rng = np.random.RandomState(seed)
    rows: list[dict] = []
    hot_turns = max(10, int(n_turns_target * hot_fraction))
    rows.extend(_gen_conv_turns(rng, "conv-hot-0", hot_turns))
    remaining = n_turns_target - hot_turns
    ci = 0
    while remaining > 0:
        # Zipf tail capped at half the designated hot conversation's size:
        # the zipf(1.6) tail is heavy enough that one uncapped draw can
        # swallow over half the corpus into a single conv (observed: 59% at
        # 500k turns for some seeds), turning the skew KNOB (hot_fraction)
        # into an accident of the rng stream; the cap keeps conv-hot-0 the
        # unique maximum
        n = int(min(remaining, max(3, min(rng.zipf(1.6) * 4, hot_turns // 2))))
        rows.extend(_gen_conv_turns(rng, f"conv-{ci:06d}", n))
        remaining -= n
        ci += 1
    df = pd.DataFrame(rows)
    # timestamps: base + turn_idx minutes, monotone per conv
    base = pd.Timestamp("2026-01-01", tz=None)
    df["ts"] = base + pd.to_timedelta(df["turn_idx"], unit="m")
    # exact duplicate injection (reference duplicate-PK collisions,
    # scrapingHelpers.py:61-115)
    n_dup = int(len(df) * dup_fraction)
    if n_dup:
        dup_idx = rng.choice(len(df), size=n_dup, replace=False)
        df = pd.concat([df, df.iloc[dup_idx]], ignore_index=True)
    # shuffled emission order
    perm = rng.permutation(len(df))
    df = df.iloc[perm].reset_index(drop=True)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]


def make_alias_edges() -> pd.DataFrame:
    """Alias graph with chains (a→b→c) and a cycle (FIXTURES.md §3)."""
    rows = [
        # chain: v_3 -> v_2 -> base
        ("us/ca/bpc/section=100-v_3", "us/ca/bpc/section=100-v_2", "version_tag"),
        ("us/ca/bpc/section=100-v_2", "us/ca/bpc/section=100", "version_tag"),
        # copy chain
        ("us/federal/ecfr/title=40/part=100-copy-2", "us/federal/ecfr/title=40/part=100-copy-1", "copy"),
        ("us/federal/ecfr/title=40/part=100-copy-1", "us/federal/ecfr/title=40/part=100", "copy"),
        # link aliases forming a cycle a->b, b->c, c->a
        ("us/federal/usc/title=5/section=001", "usc-alias-a", "link_alias"),
        ("usc-alias-a", "usc-alias-b", "link_alias"),
        ("usc-alias-b", "us/federal/usc/title=5/section=001", "link_alias"),
        # isolated pair
        ("us/federal/agency=epa", "epa-alias", "link_alias"),
    ]
    return pd.DataFrame(rows, columns=["src", "dst", "reason"])
