"""Single-process pure-Python oracle — the executable spec.

Re-implements the reference's extraction pipeline imperatively, per
conversation, the way the reference processes one document at a time
(reference ``src/1_SCRAPE_TEMPLATE/2_scrape_regular.py:33-146``,
``scrapeECFR.py:239-368``): a running parent stack for hierarchy
(scrapeCA.py:150-221 analog), a definitions-scope flag
(scrapeECFR.py:530-560), mention extraction + the candidate-key linking
ladder (pydanticModels.py:555-636), and duplicate-id versioning
(scrapingHelpers.py:61-115).

Shares ``rules.py`` with the Spark kernels for the low-level regex rules —
the *structural* logic (ordering, parent resolution, scope, versioning,
linking, connected components) is implemented independently here, so the
P/R test is a real cross-check of the distributed DAG.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from . import rules


def build_linking_index(entity_dict: pd.DataFrame) -> dict[str, str]:
    """alias key → entity_id (first writer wins, stable by entity_id)."""
    index: dict[str, str] = {}
    for _, row in entity_dict.sort_values("entity_id").iterrows():
        for alias in row["aliases"] or []:
            index.setdefault(alias, row["entity_id"])
    return index


def link_raw_key(raw_key: str, index: dict[str, str]) -> str | None:
    """Resolve via the ranked candidate ladder (lowest priority wins)."""
    for _prio, key in sorted(rules.candidate_keys(raw_key)):
        if key in index:
            return index[key]
    return None


def run_oracle(
    transcripts: pd.DataFrame,
    entity_dict: pd.DataFrame,
) -> dict[str, pd.DataFrame]:
    """Run the full per-conversation extraction spec.

    Returns dict with ``nodes``, ``triples`` (subj, pred, obj, conv_id,
    turn_idx), and ``turns`` (deduped, ordered, cleaned — the per-turn
    invariant surface).
    """
    index = build_linking_index(entity_dict)

    # stable order + first-writer-wins dedup of (conv_id, turn_idx)
    # (reference dedup_skip, scrapingHelpers.py:110-114)
    # tie-break on md5(text), not raw text: deterministic and identical in
    # the Spark engines, where it keeps the full text out of the shuffle's
    # sort key (only matters when (conv_id, turn_idx, ts) collide with
    # *different* texts — exact duplicates are unaffected by the pick)
    import hashlib

    # null text maps to "" (sorts before any hex digest), mirroring Spark
    # where md5(NULL) is NULL and NULLs sort first under the default asc
    df = transcripts.assign(
        _tb=transcripts["text"].map(
            lambda t: ""
            if t is None or (isinstance(t, float) and pd.isna(t))
            else hashlib.md5(str(t).encode("utf-8")).hexdigest()
        )
    )
    df = (
        df.sort_values(["conv_id", "turn_idx", "ts", "_tb"], kind="mergesort")
        .drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")
        .drop(columns=["_tb"])
    )

    nodes_rows: list[dict] = []
    triple_rows: list[dict] = []
    turn_rows: list[dict] = []
    # node_id -> (conv_id, turn_idx, text): LAST addendum trailer under the
    # node wins (reference extract_addendum, scrapeECFR.py:867-992)
    addendum_by_node: dict[str, tuple[str, int, str]] = {}
    # node_id -> ordered [(turn_idx, text)] of content turns under the node
    # (reference NodeText paragraph list, pydanticModels.py:203-366)
    node_texts: dict[str, list[tuple[int, str]]] = defaultdict(list)
    # definition-scope closure inputs (reference fetch_definitions walk,
    # pydanticModels.py:654-757): per-scope local dict entries and
    # incorporated (scope, term, hub) pointers, corpus-wide
    local_def_rows: list[tuple[str, str, str, int]] = []  # scope, term, def, tix
    incorp_def_rows: list[tuple[str, str, str, int]] = []  # scope, term, hub, tix

    for conv_id, conv in df.groupby("conv_id", sort=True):
        root = rules.conv_root_id(conv_id)
        nodes_rows.append(
            {
                "node_id": root,
                "node_type": "structure",
                "level_classifier": "conv",
                "name": conv_id,
                "parent": None,
                "status": "valid",
                "conv_id": conv_id,
                "turn_idx": None,
                "text": None,
            }
        )
        # running parent stack: list of (rank, node_id)
        stack: list[tuple[int, str]] = []
        current_node = root
        in_defs = False
        id_counts: dict[str, int] = defaultdict(int)

        for _, row in conv.iterrows():
            text = rules.clean_text(row["text"])
            turn_rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": int(row["turn_idx"]),
                    "clean_text": text,
                    "rewritten_text": text,
                }
            )
            hier = rules.parse_hierarchy_marker(text)
            if hier is not None:
                classifier, number, name = hier
                rank = rules.LEVEL_RANKS[classifier]
                while stack and stack[-1][0] >= rank:
                    stack.pop()
                parent = stack[-1][1] if stack else root
                raw_id = rules.id_add_level(parent, classifier, number)
                id_counts[raw_id] += 1
                n = id_counts[raw_id]
                node_id = raw_id if n == 1 else f"{raw_id}-v_{n}"
                stack.append((rank, node_id))
                current_node = node_id
                in_defs = False
                nodes_rows.append(
                    {
                        "node_id": node_id,
                        "node_type": "content" if classifier == "section" else "structure",
                        "level_classifier": classifier,
                        "name": name,
                        "parent": parent,
                        "status": rules.node_status(name),
                        "conv_id": conv_id,
                        "turn_idx": int(row["turn_idx"]),
                        "text": text,
                    }
                )
                triple_rows.append(
                    {
                        "subj": node_id,
                        "pred": "child_of",
                        "obj": parent,
                        "conv_id": conv_id,
                        "turn_idx": int(row["turn_idx"]),
                    }
                )
                if n > 1:
                    triple_rows.append(
                        {
                            "subj": node_id,
                            "pred": "alias_of",
                            "obj": raw_id,
                            "conv_id": conv_id,
                            "turn_idx": int(row["turn_idx"]),
                        }
                    )
                continue

            # content turn: paragraph of the current node's document text
            node_texts[current_node].append((int(row["turn_idx"]), text))

            if rules.is_definitions_header(text):
                in_defs = True

            # addendum trailer: last one under the current node wins; its
            # mentions still flow into the mention stream below
            if rules.is_addendum(text):
                addendum_by_node[current_node] = (
                    conv_id,
                    int(row["turn_idx"]),
                    text,
                )

            # citation / URL mentions → cites triples (linked only;
            # misses are metrics, not triples) + placeholder substitutions
            # for the rewritten text (reference [*url*] injection,
            # scrapeECFR.py:1135-1146)
            subs: list[tuple[int, int, str]] = []
            for mention in rules.extract_mentions(text):
                entity = link_raw_key(mention["raw_key"], index)
                if entity is not None:
                    triple_rows.append(
                        {
                            "subj": current_node,
                            "pred": "cites",
                            "obj": entity,
                            "conv_id": conv_id,
                            "turn_idx": int(row["turn_idx"]),
                        }
                    )
                    subs.append(
                        (mention["start"], len(mention["mention_text"]), entity)
                    )
            if subs:
                # same ordering as the Spark array_sort(struct(start,len,id))
                subs.sort()
                acc, pos = "", 0
                for start, ln, ent in subs:
                    if start < pos:  # overlapping mention: skip
                        continue
                    acc += text[pos:start] + f"[*{ent}*]"
                    pos = start + ln
                turn_rows[-1]["rewritten_text"] = acc + text[pos:]

            # definitions → defined_as / defined_in_scope triples
            for d in rules.extract_definitions(text, in_defs):
                term_id = f"{current_node}/term={d['term']}"
                if d["kind"] == "incorporated":
                    src_mentions = rules.extract_mentions(d["incorporated_from"])
                    obj = None
                    if src_mentions:
                        obj = link_raw_key(src_mentions[0]["raw_key"], index)
                    if obj is None:
                        obj = d["incorporated_from"]
                    incorp_def_rows.append(
                        (current_node, d["term"], obj, int(row["turn_idx"]))
                    )
                    triple_rows.append(
                        {
                            "subj": term_id,
                            "pred": "defined_in_scope",
                            "obj": obj,
                            "conv_id": conv_id,
                            "turn_idx": int(row["turn_idx"]),
                        }
                    )
                else:
                    local_def_rows.append(
                        (current_node, d["term"], d["definition"], int(row["turn_idx"]))
                    )
                    triple_rows.append(
                        {
                            "subj": term_id,
                            "pred": "defined_as",
                            "obj": d["definition"],
                            "conv_id": conv_id,
                            "turn_idx": int(row["turn_idx"]),
                        }
                    )
                    triple_rows.append(
                        {
                            "subj": term_id,
                            "pred": "defined_in_scope",
                            "obj": current_node,
                            "conv_id": conv_id,
                            "turn_idx": int(row["turn_idx"]),
                        }
                    )
                    if d.get("parent_term"):
                        triple_rows.append(
                            {
                                "subj": term_id,
                                "pred": "subdefinition_of",
                                "obj": f"{current_node}/term={d['parent_term']}",
                                "conv_id": conv_id,
                                "turn_idx": int(row["turn_idx"]),
                            }
                        )

    # addendum triples + node column (last trailer per node)
    for node_id, (cid, tix, txt) in addendum_by_node.items():
        triple_rows.append(
            {
                "subj": node_id,
                "pred": "addendum",
                "obj": txt,
                "conv_id": cid,
                "turn_idx": tix,
            }
        )
    def _node_text(n: str) -> str | None:
        """Ordered paragraph join under the node, the peeled addendum turn
        excluded (reference removes the trailing source paragraph from the
        node body, extract_addendum scrapeECFR.py:905-940)."""
        lst = node_texts.get(n, [])
        ad = addendum_by_node.get(n)
        if ad is not None:
            lst = [(tix, t) for tix, t in lst if tix != ad[1]]
        return "\n".join(t for _, t in lst) if lst else None

    # phase-3 relationship columns (reference node_direct_children /
    # node_siblings / node_incoming_references, CLAUDE.md:171-174):
    # parent → ordered child list (by (turn_idx, id), turn_idx -1 for
    # roots — the Spark children_agg sort key), reverse cites aggregate
    children: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for r in nodes_rows:
        if r["parent"] is not None:
            o = r["turn_idx"] if r["turn_idx"] is not None else -1
            children[r["parent"]].append((o, r["node_id"]))
    children_sorted = {p: [nid for _, nid in sorted(v)] for p, v in children.items()}
    incoming: dict[str, set[str]] = defaultdict(set)
    for t in triple_rows:
        if t["pred"] == "cites":
            incoming[t["obj"]].add(t["subj"])

    nodes = pd.DataFrame(nodes_rows)
    if nodes_rows:
        nodes["node_addendum"] = nodes["node_id"].map(
            lambda n: addendum_by_node[n][2] if n in addendum_by_node else None
        )
        nodes["node_text"] = nodes["node_id"].map(_node_text)
        nodes["citation"] = nodes["node_id"].map(rules.node_citation)
        nodes["direct_children"] = nodes["node_id"].map(
            lambda n: children_sorted.get(n)
        )
        nodes["siblings"] = nodes.apply(
            lambda r: [c for c in children_sorted[r["parent"]] if c != r["node_id"]]
            if r["parent"] is not None
            else None,
            axis=1,
        )
        nodes["incoming_references"] = nodes["node_id"].map(
            lambda n: sorted(incoming[n]) if n in incoming else None
        )
    else:
        # zero-conversation input: pd.DataFrame([]) is column-less and
        # nodes["node_id"] would raise — construct the empty frame with the
        # expected columns instead (round-2 advice)
        nodes = pd.DataFrame(
            columns=[
                "node_id",
                "node_type",
                "level_classifier",
                "name",
                "parent",
                "status",
                "conv_id",
                "turn_idx",
                "text",
                "node_addendum",
                "node_text",
                "citation",
                "direct_children",
                "siblings",
                "incoming_references",
            ]
        )

    applicable = _applicable_definitions(
        [r["node_id"] for r in nodes_rows], local_def_rows, incorp_def_rows
    )

    return {
        "nodes": nodes,
        "triples": pd.DataFrame(triple_rows),
        "turns": pd.DataFrame(turn_rows),
        "applicable_defs": applicable,
    }


def _applicable_definitions(
    node_ids: list[str],
    local_def_rows: list[tuple[str, str, str, int]],
    incorp_def_rows: list[tuple[str, str, str, int]],
    max_depth: int = 10,
) -> pd.DataFrame:
    """Pure-Python twin of ``operators.defscope.applicable_definitions``
    (reference fetch_definitions, pydanticModels.py:654-757): closest scope
    wins per term; at equal depth incorporated overwrites local and a later
    turn overwrites an earlier one (the reference's dict-merge order)."""
    # per-scope dictionary: last writer wins per (scope, term)
    local_dict: dict[tuple[str, str], tuple[int, str]] = {}
    for scope, term, definition, tix in local_def_rows:
        cand = (tix, definition if definition is not None else "")
        key = (scope, term)
        if key not in local_dict or cand > local_dict[key]:
            local_dict[key] = cand
    # scope → list of (prio, tix, definition, hub, src) entries per term
    entries: dict[str, list[tuple[str, int, int, str | None, str | None, str]]] = (
        defaultdict(list)
    )
    for (scope, term), (tix, definition) in local_dict.items():
        entries[scope].append((term, 0, tix, definition, None, "local"))
    for scope, term, hub, tix in incorp_def_rows:
        hd = local_dict.get((hub, term))
        entries[scope].append(
            (term, 1, tix, hd[1] if hd else None, hub, "incorporated")
        )
    rows = []
    for node_id in sorted(set(node_ids)):
        parts = node_id.split("/")
        lo = max(1, len(parts) - (max_depth - 1))
        best: dict[str, tuple] = {}
        for depth in range(lo, len(parts) + 1):
            scope = "/".join(parts[:depth])
            for term, prio, tix, definition, hub, src in entries.get(scope, []):
                resolved = 1 if definition is not None else 0
                key = (resolved, depth, prio, tix, definition or "", hub or "")
                if term not in best or key > best[term][0]:
                    best[term] = (key, definition, scope, src, hub, depth)
        for term, (_, definition, scope, src, hub, depth) in best.items():
            rows.append(
                {
                    "node_id": node_id,
                    "term": term,
                    "definition": definition,
                    "def_scope": scope,
                    "src": src,
                    "hub": hub,
                    "depth": depth,
                }
            )
    return pd.DataFrame(
        rows,
        columns=[
            "node_id", "term", "definition", "def_scope", "src", "hub", "depth",
        ],
    )


def connected_components(edges: pd.DataFrame) -> dict[str, str]:
    """Union-find over alias edges → member → min-id canonical label.

    Spec for the iterative DataFrame CC in ``operators/canonicalize.py``
    (reference behavior: version tags + link aliases tie duplicates to one
    canonical node, scrapingHelpers.py:94-98, pydanticModels.py:555-636).
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo

    for _, row in edges.iterrows():
        union(row["src"], row["dst"])
    return {x: find(x) for x in list(parent)}


def precision_recall(
    got: set[tuple[str, str, str]], expected: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not got or not expected:
        return (0.0, 0.0)
    tp = len(got & expected)
    return tp / len(got), tp / len(expected)
