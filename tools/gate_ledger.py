"""Gate-window ledger: mechanical bookkeeping of which plan is proven
by which round's driver gate, against WHICH code.

The driver's correctness gate samples a 50-plan prefix of the registry
per round, so a plan can carry a green row from round N while its code
changed in round N+1 — verified only by the local parity suite until
it re-enters the window. Round 5's verdict called out exactly this
class (~21 quantize-swept plans); this tool replaces the
comment-archaeology in plans/__init__.py with a checked-in JSON.

Ledger format (tools/gate_ledger.json):
    {"plan_name": {"round": 5, "fingerprint": "sha256…" | null}, …}
``fingerprint`` is sha256 over the plan function's source + its oracle
SQL at the time the green row was earned; ``null`` means the gate-time
code is unknown (green row predates the ledger) — treated as stale.

Commands:
    python tools/gate_ledger.py update N   # after CORRECTNESS_rN lands
        record round N's green plans with CURRENT fingerprints — run at
        round start, BEFORE editing code, when tree == gate-time code.
    python tools/gate_ledger.py check
        print plans whose green row predates their current code
        (fingerprint stale or unknown). Exit 1 if any.
    python tools/gate_ledger.py window-audit
        check + assert every stale plan sits inside the current
        50-plan promoted window (i.e. will re-green this round).
    python tools/gate_ledger.py window
        compose the next round's 50-plan window MECHANICALLY and write
        it to tools/gate_window.json (which plans/__init__.py reads to
        order the registry — VERDICT r11 #8, replacing the per-round
        window lists that used to accrete there):
          tier 1 — every stale plan (must re-green);
          tier 2 — drift canaries: the OLDEST-green plans, filling the
                   remaining slots, so no green row ages unbounded.
        Run at round CLOSE, after the round's last code edit, so the
        stale set is final.
"""

from __future__ import annotations

import hashlib
import inspect
import types
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LEDGER = REPO / "tools" / "gate_ledger.json"
WINDOW_FILE = REPO / "tools" / "gate_window.json"
OVERFLOW_FILE = REPO / "tools" / "gate_overflow.json"
WINDOW = 50  # driver gate samples this many plans off the registry front
# excluded from the helper-closure fingerprint — see _closure_source
INFRA_MODULES = {
    "compendium_spark.tables",
    "compendium_spark.session",
}


def _registry():
    sys.path.insert(0, str(REPO))
    from compendium_spark.plans import all_plans  # noqa: PLC0415

    return all_plans()


def _closure_source(fn, seen: set | None = None) -> str:
    """Source of ``fn`` plus, recursively, of every compendium_spark
    callable its source references by name (resolved through
    ``__globals__``). A plan's behavior lives partly in shared helpers
    (pipeline/crawl.warc_responses_to_documents, expectations.check,
    graph.capped_neighbor_lists, numeric.quantize6, …); hashing only
    the ``@plan`` body would let a helper edit change every dependent
    plan while the ledger still reported them clean — the exact
    staleness the tool exists to catch. Module-level CONSTANTS are not
    chased; parity-relevant constants are baked into the oracle SQL
    f-strings, which the fingerprint already covers.

    Cross-cutting INFRASTRUCTURE modules (tables.py's load /
    maybe_broadcast, session.py) are deliberately excluded: every plan
    in every round's 50-sample exercises them, so a change there is
    caught by the very next gate run no matter which plans are
    windowed — including them would flag the entire registry on any
    loader tweak (measured: 117 plans, 2.3× the window) and make the
    all-stale-in-window invariant unsatisfiable, burying the real
    signal. A NICHE helper (crawl extraction, expectations.check, the
    wedge cap) is exercised only by its dependents, which is exactly
    when the ledger must force them back into the window.
    Deterministic: names are visited sorted, depth-first, memoized."""
    import re as _re  # noqa: PLC0415

    if seen is None:
        seen = set()
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return ""
    parts = [src]
    # name-scan CODE only: docstrings/comments/SQL strings mention
    # other plans by name in prose, and chasing those would pull
    # unrelated sources into the closure (false-stale over-capture)
    code = _re.sub(r'"""[\s\S]*?"""|\'\'\'[\s\S]*?\'\'\'', "", src)
    code = _re.sub(r"#[^\n]*", "", code)
    g = getattr(fn, "__globals__", {})
    # bare names, plus module-attribute references (`sw.streaming_scd2`
    # where `sw` is an imported compendium_spark module): the plan
    # wrappers in plans/streaming_plans.py reach their implementation
    # ONLY through such dotted names, and before round 7 the scan
    # resolved just the bare module object (not callable -> skipped),
    # leaving the whole streaming implementation module invisible to
    # the fingerprint — a windows.py edit flagged nothing.
    targets = []
    for name in sorted(set(_re.findall(r"[A-Za-z_]\w*", code))):
        targets.append(g.get(name))
    for mod_name, attr in sorted(set(_re.findall(r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)", code))):
        base = g.get(mod_name)
        if isinstance(base, types.ModuleType) and (
            base.__name__.startswith("compendium_spark")
            and base.__name__ not in INFRA_MODULES
        ):
            targets.append(getattr(base, attr, None))
    # FUNCTION-BODY imports (`from compendium_spark.x import y` inside
    # the plan, the lazy-import idiom) bind LOCALS, not __globals__, so
    # the name scan above never resolves them — before round 12 a
    # storage_versioned.py edit left every sink_* plan fingerprint-
    # clean (the exact invisible-helper class this tool exists to
    # catch). Resolve them through importlib instead.
    import importlib  # noqa: PLC0415

    for mod_name, names in _re.findall(
        r"from\s+(compendium_spark[\w.]*)\s+import\s+"
        r"(\([^)]*\)|[^\n]+)",
        code,
    ):
        if mod_name in INFRA_MODULES:
            continue
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        for item in names.strip("()").split(","):
            item = item.split("#")[0].split(" as ")[0].strip()
            if item:
                targets.append(getattr(mod, item, None))
    for obj in targets:
        if obj is None or id(obj) in seen or not callable(obj):
            continue
        mod = getattr(obj, "__module__", None) or ""
        if mod.startswith("compendium_spark") and mod not in INFRA_MODULES:
            seen.add(id(obj))
            parts.append(_closure_source(obj, seen))
    return "\n".join(parts)


def fingerprint(p) -> str:
    return hashlib.sha256(
        (_closure_source(p.fn) + "\x00" + (p.oracle or "")).encode()
    ).hexdigest()[:16]


def _load() -> dict:
    if LEDGER.exists():
        return json.loads(LEDGER.read_text())
    return {}

def _green(corr: dict) -> list[str]:
    return [
        n
        for n, r in corr.items()
        if r.get("rows_match")
        and r.get("schema_match")
        and r.get("hash_match") is not False
        and not r.get("err")
    ]


def cmd_update(round_no: int) -> None:
    corr_path = REPO / f"CORRECTNESS_r{round_no:02d}.json"
    corr = json.loads(corr_path.read_text())
    plans = _registry()
    ledger = _load()
    for name in _green(corr):
        if name not in plans:
            print(f"  (skip {name}: no longer registered)")
            continue
        ledger[name] = {
            "round": round_no,
            "fingerprint": fingerprint(plans[name]),
        }
    LEDGER.write_text(json.dumps(dict(sorted(ledger.items())), indent=1) + "\n")
    print(f"recorded {len(_green(corr))} green plans for r{round_no:02d}")


def stale_plans() -> dict[str, str]:
    """plan -> reason, for every plan whose driver-green row does not
    cover its current code."""
    plans = _registry()
    ledger = _load()
    out: dict[str, str] = {}
    for name, p in plans.items():
        entry = ledger.get(name)
        if entry is None:
            if p.oracle is None:
                # rows-only by design: the driver records `no_oracle`;
                # a hash-green row can never exist. Their deterministic
                # twins carry the value check.
                continue
            out[name] = "never driver-green"
        elif entry["fingerprint"] is None:
            out[name] = f"green r{entry['round']:02d} but gate-time code unknown"
        elif entry["fingerprint"] != fingerprint(p):
            out[name] = f"code changed since green r{entry['round']:02d}"
    return out


def cmd_check() -> int:
    stale = stale_plans()
    if not stale:
        print("ledger clean: every plan's green row matches its current code")
        return 0
    for name, why in sorted(stale.items()):
        print(f"STALE {name}: {why}")
    print(f"{len(stale)} plan(s) need a slot in the next gate window")
    return 1


def overflow() -> dict[str, str]:
    """plan -> reason, from tools/gate_overflow.json. The declared
    escape hatch for the one situation the window cannot satisfy: MORE
    stale plans than slots (a shared-helper edit late in a round can
    fingerprint-flag half a family at once). An overflow entry says
    "this plan's only change is one a gate sample of its siblings
    exercises identically, and its own output was re-verified against
    the oracle locally at every SF" — the reason string must name that
    evidence. Consulted ONLY when stale > WINDOW; with a free slot,
    every stale plan goes in the window and the file is ignored."""
    if OVERFLOW_FILE.exists():
        data = json.loads(OVERFLOW_FILE.read_text())
        return {k: v for k, v in data.items() if not k.startswith("_")}
    return {}


def cmd_window() -> int:
    """Compose and persist the next gate window: stale plans first
    (they NEED a green row), then the oldest-green canaries to fill
    the 50 slots. Deterministic given the ledger + tree. When the
    stale set exceeds the slot count, the declared overflow (see
    ``overflow``) names which stale plans yield their slot — and only
    then; the composition errors rather than silently dropping one."""
    plans = _registry()
    ledger = _load()
    stale = stale_plans()
    window = sorted(stale)
    dropped: list[str] = []
    if len(window) > WINDOW:
        ovf = overflow()
        bogus = sorted(set(ovf) - set(stale))
        if bogus:
            print(f"ERROR: overflow entries not stale: {bogus}")
            return 1
        window = sorted(set(stale) - set(ovf))
        dropped = sorted(set(stale) & set(ovf))
        if len(window) > WINDOW:
            print(
                f"ERROR: {len(window)} stale plans after overflow still "
                f"exceed the {WINDOW}-slot window — extend "
                f"{OVERFLOW_FILE.name} (with local-parity evidence) or "
                "split across rounds"
            )
            return 1
    canaries = sorted(
        (n for n in plans if n in ledger and n not in stale),
        key=lambda n: (ledger[n]["round"], n),
    )
    window += canaries[: WINDOW - len(window)]
    n_stale_in = len(stale) - len(dropped)
    WINDOW_FILE.write_text(
        json.dumps(
            {
                "_comment": (
                    "Gate window (driver samples this prefix of the "
                    "registry). Composed by `gate_ledger.py window`: "
                    f"{n_stale_in} stale + "
                    f"{len(window) - n_stale_in} oldest-green canaries"
                    + (
                        f" ({len(dropped)} stale deferred to "
                        f"{OVERFLOW_FILE.name})"
                        if dropped
                        else ""
                    )
                    + "."
                ),
                "window": window,
                "overflow": dropped,
            },
            indent=1,
        )
        + "\n"
    )
    print(
        f"wrote {WINDOW_FILE.name}: {n_stale_in} stale + "
        f"{len(window) - n_stale_in} canaries"
        + (f" + {len(dropped)} overflow (outside)" if dropped else "")
        + " (oldest green r"
        f"{min((ledger[n]['round'] for n in window if n in ledger), default=0):02d})"
    )
    return 0


def cmd_window_audit() -> int:
    stale = stale_plans()
    window = list(_registry())[:WINDOW]
    outside = sorted(set(stale) - set(window))
    ovf = overflow() if len(stale) > WINDOW else {}
    print(f"window: {len(window)} slots, {len(stale)} stale plan(s)")
    bad = [n for n in outside if n not in ovf]
    for name in outside:
        if name in ovf:
            print(f"OVERFLOW {name}: {ovf[name]}")
        else:
            print(f"OUTSIDE-WINDOW {name}: {stale[name]}")
    if bad:
        return 1
    print("every stale plan is inside the promoted window or declared overflow")
    return 0


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    cmd = sys.argv[1]
    if cmd == "update":
        cmd_update(int(sys.argv[2]))
        return 0
    if cmd == "check":
        return cmd_check()
    if cmd == "window":
        return cmd_window()
    if cmd == "window-audit":
        return cmd_window_audit()
    print(f"unknown command {cmd!r}")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
