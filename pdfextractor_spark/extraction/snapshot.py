"""Snapshot regression scheme for normalized cost tables (sha1-pinned).

Ports the reference's hashing EXACTLY — including JS string coercion rules —
so a snapshot produced here is byte-comparable with one produced by the
reference over the same normalized tables.
Ref: backend/scripts/snapshot_cost_tables.js:20,26-46 (hash construction),
61-82 (diff classification).
"""

from __future__ import annotations

import hashlib

__all__ = ["build_snapshot", "diff_snapshots", "js_num_str", "sha1_hex"]


def sha1_hex(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def js_num_str(v) -> str:
    """JS ``String(x)`` for the values that appear in table totals:
    numbers render without trailing .0; None/undefined -> 'null' only when
    interpolated, '' under ``|| ''``. Callers pick the coercion they need."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v) and abs(v) < 1e21:
        return str(int(v))
    return str(v)


def _join_coerce(parts) -> str:
    """JS Array.join('||'): null/undefined -> '', numbers via String()."""
    return "||".join(js_num_str(p) if not isinstance(p, str) else p for p in parts)


def build_snapshot(report: dict) -> dict:
    """Silver report -> snapshot {reportId, tables[...], combinedHash}."""
    tables = []
    for t in report.get("bmpCostTablesNormalized") or []:
        rows = t.get("rows") or []
        row_names = [r.get("name") or "" for r in rows]
        row_names = [n for n in row_names if n]
        name_hash = sha1_hex("|".join(row_names))
        # String(t.totalComputed||'') — JS `||` treats 0 as falsy
        tc = t.get("totalComputed")
        tr = t.get("totalReported")
        total_hash = sha1_hex(
            (js_num_str(tc) if tc else "") + "|" + (js_num_str(tr) if tr else "")
        )
        table_hash = sha1_hex(_join_coerce([
            t.get("id"), t.get("patternId"), "|".join(row_names), tr, tc,
        ]))
        tables.append({
            "id": t.get("id") or "table_" + sha1_hex(t.get("title") or "untitled")[:8],
            "title": t.get("title"),
            "patternId": t.get("patternId"),
            "rowCount": len(rows),
            "totalReported": tr if tr is not None else None,
            "totalComputed": tc if tc is not None else None,
            "hash": table_hash,
            "rowHashes": {"nameHash": name_hash, "totalHash": total_hash},
        })
    combined = sha1_hex("|".join(sorted(t["hash"] for t in tables)))
    return {"reportId": report.get("id"), "tables": tables, "combinedHash": combined}


def diff_snapshots(old: dict, new: dict) -> list[str]:
    """ADDED/REMOVED/CHANGED classification, same strings as the reference."""
    diffs: list[str] = []
    old_map = {t["id"]: t for t in old["tables"]}
    new_map = {t["id"]: t for t in new["tables"]}
    for tid in old_map:
        if tid not in new_map:
            diffs.append(f"REMOVED table {tid}")
    for tid in new_map:
        if tid not in old_map:
            diffs.append(f"ADDED table {tid}")
    for tid, b in new_map.items():
        a = old_map.get(tid)
        if a is None:
            continue
        if a["hash"] != b["hash"]:
            if a["rowCount"] != b["rowCount"]:
                diffs.append(f"CHANGED {tid} rowCount {a['rowCount']}->{b['rowCount']}")
            if a["totalReported"] != b["totalReported"]:
                diffs.append(f"CHANGED {tid} totalReported {a['totalReported']}->{b['totalReported']}")
            if a["totalComputed"] != b["totalComputed"]:
                diffs.append(f"CHANGED {tid} totalComputed {a['totalComputed']}->{b['totalComputed']}")
            if a["rowHashes"]["nameHash"] != b["rowHashes"]["nameHash"]:
                diffs.append(f"CHANGED {tid} row set hash")
    if old["combinedHash"] != new["combinedHash"]:
        diffs.append("CHANGED combinedHash")
    return diffs
