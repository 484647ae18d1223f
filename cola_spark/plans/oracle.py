"""Pure-Python reference evaluator of the scheduler semantics.

~150 lines of sequential dict/list code implementing exactly the
contract the Spark plan implements set-based: admission dedup (force
bypass, first-by-seq within batch), robots gating, per-host
priority-FIFO budget cut, crc32 fetch coin, retry/requeue, link
discovery. Used by tests to assert crawl-order match rate == 1.0 and
URL-seen set equality (BASELINE.json:14) — the small-N stand-in for
the reference implementation, mirroring how cola would schedule the
same seed list under the same politeness budget.
"""

from __future__ import annotations

import re
import zlib
from urllib.parse import urlsplit

from cola_spark.operators.budget import ERR_WINDOW

CHILD_SEQ_OFFSET = 10**12
FAIL_MOD = 20


def canonicalize(url: str) -> str | None:
    u = re.sub(r"#.*$", "", url)
    try:
        parts = urlsplit(u)
    except ValueError:
        return None
    if not parts.scheme or not parts.netloc:
        return None
    scheme = parts.scheme.lower()
    auth = parts.netloc.lower()
    if scheme == "http" and auth.endswith(":80"):
        auth = auth[:-3]
    elif scheme == "https" and auth.endswith(":443"):
        auth = auth[:-4]
    path = parts.path or "/"
    q = parts.query
    qpart = "?" + "&".join(sorted(q.split("&"))) if q else ""
    return f"{scheme}://{auth}{path}{qpart}"


def _crc(s: str) -> int:
    return zlib.crc32(s.encode()) & 0xFFFFFFFF


def run_oracle(
    seeds: list[dict],
    robots: list[dict],
    budgets: list[dict],
    pages_per_host: int = 50,
    max_rounds: int = 30,
    max_retries: int = 3,
    adaptive: bool = False,
    global_cap: int | None = None,
) -> dict:
    """seeds: [{url, priority, seq, force}]; robots: [{host,
    disallow_prefix}]; budgets: [{host, budget, rate_per_round}].
    Returns {"order": [...], "seen": set, "ledger": {...}}.
    """
    disallow: dict[str, list[str]] = {}
    for r in robots:
        disallow.setdefault(r["host"], []).append(r["disallow_prefix"])
    ledger = {
        b["host"]: {
            "budget": b["budget"], "rate": b["rate_per_round"],
            "applied": 0, "finished": 0, "errored": 0, "last_errored": 0,
            "err_hist": [],
        }
        for b in budgets
    }

    def prep(row):
        canon = canonicalize(row["url"])
        if canon is None:
            return None
        parts = urlsplit(canon)
        return {
            "url": row["url"], "url_canon": canon, "host": parts.hostname,
            "path": parts.path or "/", "priority": row["priority"],
            "seq": row["seq"], "force": row["force"],
            "error_times": row.get("error_times", 0),
        }

    seen: set[str] = set()
    pending: list[dict] = []
    order: list[dict] = []
    candidates = [p for p in (prep(s) for s in seeds) if p is not None]

    for rnd in range(max_rounds):
        # admission: sequential put order = seq order (first wins)
        admitted = []
        for c in sorted(candidates, key=lambda x: x["seq"]):
            if c["force"]:
                admitted.append(c)
            elif c["url_canon"] not in seen:
                seen.add(c["url_canon"])
                admitted.append(c)
        # robots gate
        for c in admitted:
            if not any(c["path"].startswith(p) for p in disallow.get(c["host"], [])):
                pending.append(c)
        # budget cut in (priority, seq) order per host
        scheduled: list[dict] = []
        by_host: dict[str, list[dict]] = {}
        for p in pending:
            by_host.setdefault(p["host"], []).append(p)
        for host, rows in by_host.items():
            lg = ledger.get(host)
            if lg is None:
                continue
            if adaptive and lg["err_hist"]:
                # windowed backoff: ceil(mean(errors over last k rounds))
                h = lg["err_hist"]
                rate = max(lg["rate"] - -(-sum(h) // len(h)), 1)
            else:
                rate = lg["rate"]
            cap = min(lg["budget"] - lg["applied"], rate)
            if cap <= 0:
                continue
            rows.sort(key=lambda x: (x["priority"], x["seq"]))
            for rank, row in enumerate(rows[:cap], start=1):
                row = dict(row, host_rank=rank, round=rnd)
                scheduled.append(row)
                lg["applied"] += 1
        if global_cap is not None and len(scheduled) > global_cap:
            # cluster-wide speed.max: keep the first global_cap grants in
            # (priority, seq) order; the rest return budget and stay pending
            scheduled.sort(key=lambda x: (x["priority"], x["seq"]))
            for row in scheduled[global_cap:]:
                ledger[row["host"]]["applied"] -= 1
            scheduled = scheduled[:global_cap]
        if not scheduled:
            break
        sched_seqs = {s["seq"] for s in scheduled}
        pending = [p for p in pending if p["seq"] not in sched_seqs]
        # fetch + retry + children
        round_errors: dict[str, int] = {}
        candidates = []
        for s in scheduled:
            c = _crc(s["url_canon"])
            lg = ledger[s["host"]]
            if c % FAIL_MOD == 0:  # fetch failure
                s_fail = dict(s)
                s_fail["error_times"] += 1
                s_fail["force"] = True
                lg["applied"] -= 1  # error() returns budget
                lg["errored"] += 1
                round_errors[s["host"]] = round_errors.get(s["host"], 0) + 1
                if s_fail["error_times"] < max_retries:
                    candidates.append({k: s_fail[k] for k in (
                        "url", "url_canon", "host", "path", "priority",
                        "seq", "force", "error_times")})
                s["fetch_ok"] = False
            else:
                lg["finished"] += 1
                s["fetch_ok"] = True
                n_kids = 2 if c % 4 == 0 else (1 if c % 4 == 1 else 0)
                page = int(re.search(r"/p/(\d+)", s["url_canon"]).group(1))
                for i in range(n_kids):
                    child_page = (page * 7 + 13 * (i + 1)) % pages_per_host
                    child_url = f"http://{s['host']}/p/{child_page}"
                    kid = prep({
                        "url": child_url,
                        "priority": _crc(child_url) % 3,
                        "seq": s["seq"] * 4 + i + CHILD_SEQ_OFFSET,
                        "force": False,
                    })
                    candidates.append(kid)
            order.append(s)
        for host, lg in ledger.items():
            lg["last_errored"] = round_errors.get(host, 0)
            lg["err_hist"] = ([round_errors.get(host, 0)] + lg["err_hist"])[:ERR_WINDOW]

    order.sort(key=lambda s: (s["round"], s["priority"], s["host"], s["seq"]))
    for i, s in enumerate(order, start=1):
        s["global_rank"] = i
    return {"order": order, "seen": seen, "ledger": ledger}
