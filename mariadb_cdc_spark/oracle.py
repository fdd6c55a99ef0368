"""Sequential oracle: the reference's one-by-one event loop, in pure Python.

This is the independent implementation the Spark engine is verified against
(BASELINE.json: "per-row sha256(content) equality vs the reference's replayed
state"). It deliberately mirrors the reference's *sequential* semantics —
single reader, events applied in (binlog_file, binlog_pos) order, mutable
TABLE_MAP registry (shyikobinlog/BinaryLogEventProcessor.java:43-114) — so
that agreement between this loop and the set-wise Spark fold proves the
batch-fold equivalence argued in SURVEY.md §7.

Driver-side and O(n) single-threaded by design: used on test-scale inputs only.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field


@dataclass
class OracleState:
    # (database, table) -> {key_tuple: row_dict}
    tables: dict = field(default_factory=dict)
    table_maps: dict = field(default_factory=dict)  # table_id -> meta
    seen: set = field(default_factory=set)  # replay-dedup keys
    schema_changes: list = field(default_factory=list)
    xids: list = field(default_factory=list)


def replay(
    event_rows: list[dict],
    keys: list[str],
    *,
    included: list[str] | None = None,
    excluded: list[str] | None = None,
    initial: dict | None = None,
    main_table: tuple[str, str] | None = None,
) -> OracleState:
    """Apply events one by one in binlog order; return final state.

    `event_rows`: dicts shaped like EVENT_SCHEMA rows (maps as dicts).
    `initial`: optional {key_tuple: row_dict} preloaded state for main_table.
    """
    st = OracleState()
    if initial and main_table:
        st.tables[main_table] = dict(initial)

    ordered = sorted(
        event_rows,
        key=lambda e: (e["server_id"], e["binlog_file"], e["binlog_pos"]),
    )
    inc = {x.lower() for x in included} if included else None
    exc = {x.lower() for x in excluded} if excluded else set()

    for e in ordered:
        et = e["event_type"]
        if et == "TABLE_MAP":
            st.table_maps[e["table_id"]] = {
                "database": e["database"],
                "table": e["table"],
                "column_types": e["column_types"],
                "column_names": e["column_names"],
            }
            continue
        if et == "QUERY" and e.get("sql"):
            st.schema_changes.append(e["sql"])
            continue
        if et == "XID":
            st.xids.append(e.get("xid"))
            continue
        if et not in ("WRITE_ROWS", "UPDATE_ROWS", "DELETE_ROWS"):
            continue

        meta = st.table_maps.get(e["table_id"])
        if meta is None:
            continue  # orphan rows-event: dropped (reference semantics)
        dbtable = f"{meta['database']}.{meta['table']}".lower()
        if dbtable in exc or (inc is not None and dbtable not in inc):
            continue

        tkey = (meta["database"], meta["table"])
        state = st.tables.setdefault(tkey, {})
        names = meta["column_names"]
        types = meta["column_types"]
        positional = not names or (types and len(names) != len(types))

        befores = e.get("rows_before") or []
        afters = e.get("rows_after") or []
        n = max(len(befores), len(afters))
        for i in range(n):
            dk = (e["server_id"], e["binlog_file"], e["binlog_pos"], i)
            if dk in st.seen:
                continue  # at-least-once replay duplicate
            st.seen.add(dk)
            before = befores[i] if i < len(befores) else None
            after = afters[i] if i < len(afters) else None
            # columns_used bitmap projection (dual-bitmap for UPDATE,
            # reference UpdateRowsEventBinLogDataDeserializer.java:18-47):
            # the image's authoritative columns are the bitmap-set ones.
            b_used = e.get("columns_used")
            a_used = (
                e.get("update_columns_used") or e.get("columns_used")
                if et == "UPDATE_ROWS"
                else e.get("columns_used")
            )
            if positional:
                # positional index = i-th SET BIT of the image's bitmap
                # (readColumnValues assignment), not plain entry order
                before = _positional(before, b_used)
                after = _positional(after, a_used)
            before = _mask(before, b_used, names, positional)
            after = _mask(after, a_used, names, positional)
            img = after if after is not None else {}
            src = after if et != "DELETE_ROWS" else before
            k = tuple((src or {}).get(kc) or (before or {}).get(kc) for kc in keys)
            if et == "WRITE_ROWS":
                state[k] = dict(img)
            elif et == "UPDATE_ROWS":
                cur = state.get(k)
                if cur is None:
                    state[k] = dict(img)
                else:
                    cur.update(img)  # partial image: later columns win
            else:  # DELETE_ROWS
                state.pop(k, None)
    return st


def _positional(img, used=None):
    if img is None:
        return None
    if used:
        set_bits = [i for i, b in enumerate(used) if b]
        # set-bit addressing only under the wire invariant |entries|==|bits|
        if len(set_bits) == len(img):
            return {
                f"col{set_bits[i]}": v for i, v in enumerate(img.values())
            }
    return {f"col{i}": v for i, v in enumerate(img.values())}


def _mask(img, used, names, positional):
    """Keep entries whose bitmap bit is set; null bitmap / unknown key keeps
    (must mirror operators.decode.apply_column_bitmaps exactly)."""
    if img is None or used is None:
        return img
    out = {}
    for k, v in img.items():
        if positional:
            idx = int(k[3:]) if k.startswith("col") and k[3:].isdigit() else -1
        else:
            idx = names.index(k) if names and k in names else -1
        keep = used[idx] if 0 <= idx < len(used) else True
        if keep is None or keep:
            out[k] = v
    return out


def content_hashes(
    state: OracleState, table: tuple[str, str], keys: list[str]
) -> dict:
    """{key_tuple: sha256(content)} — the BASELINE.json per-row invariant."""
    out = {}
    for k, row in state.tables.get(table, {}).items():
        content = row.get("content", "") or ""
        out[k] = hashlib.sha256(content.encode("utf-8")).hexdigest()
    return out
