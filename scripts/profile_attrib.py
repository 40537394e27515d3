"""HLO-attributed device profile of the batched (or single) frame scan.

profile_frame.py groups trace events by op-name prefix ("fusion", "copy"),
which says WHAT is slow but not WHERE it comes from. This variant keeps full
op names, sums device time per op, then greps the compiled HLO text for each
hot op's metadata (source file/line + fused instruction list) so every hot
fusion/copy is attributed to filter source.

Usage: python scripts/profile_attrib.py [small|full|batched] [top_n]
"""

import glob
import gzip
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_frame import build  # noqa: E402  (same builders)


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "batched"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    reps = 3
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    compiled, args, n_frames = build(kind)
    hlo = compiled.as_text()
    out = compiled(*args)
    jax.block_until_ready(out)

    trace_dir = f"/tmp/trace_attr_{kind}"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            out = compiled(*args)
        jax.block_until_ready(out)

    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    pid_names = {}
    tid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n}

    by_op = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e or e["pid"] not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "XLA Ops" not in tname:
            continue
        name = e.get("name", "?")
        rec = by_op.setdefault(name, [0.0, 0])
        rec[0] += e["dur"]
        rec[1] += 1

    # drop wrapper rows (whole-program / while bodies)
    rows = [
        (n, d, c) for n, (d, c) in by_op.items()
        if not (n.startswith("jit_") or n == "while" or n.startswith("cond"))
    ]
    rows.sort(key=lambda r: -r[1])

    # HLO metadata lookup: "opname = ... metadata={...source_file=... source_line=...}"
    def meta_of(op):
        # fusion names in traces look like "fusion.123" or "%fusion.123"
        pat = re.compile(
            r"^\s*(?:ROOT )?%?" + re.escape(op) + r" = (.{0,160})", re.M
        )
        m = pat.search(hlo)
        head = m.group(1).strip() if m else "?"
        mm = re.search(
            r"%?" + re.escape(op) +
            r" = .*?metadata=\{([^}]*)\}", hlo, re.S
        )
        src = ""
        if mm:
            md = mm.group(1)
            f = re.search(r'source_file="([^"]+)"', md)
            ln = re.search(r"source_line=(\d+)", md)
            opn = re.search(r'op_name="([^"]+)"', md)
            src = (
                (opn.group(1)[-70:] + " ") if opn else ""
            ) + (os.path.basename(f.group(1)) if f else "") + (
                f":{ln.group(1)}" if ln else ""
            )
        return head, src

    # --- aggregate by HLO-metadata source line (the tail view) ---
    # one pass over the HLO text: opname -> "file:line op_kind"
    meta_map = {}
    pat = re.compile(
        r"%([\w.\-]+) = [^\n]*?metadata=\{([^}]*)\}"
    )
    for m in pat.finditer(hlo):
        md = m.group(2)
        f = re.search(r'source_file="([^"]+)"', md)
        ln = re.search(r"source_line=(\d+)", md)
        if f:
            meta_map[m.group(1)] = (
                os.path.basename(f.group(1)) + (f":{ln.group(1)}" if ln else "")
            )
    by_line = {}
    for name, dur, cnt in rows:
        key = meta_map.get(name)
        if key is None:
            key = "(no-metadata) " + name.split(".")[0]
        rec = by_line.setdefault(key, [0.0, 0])
        rec[0] += dur
        rec[1] += cnt
    denom = n_frames * reps
    line_rows = sorted(by_line.items(), key=lambda kv: -kv[1][0])
    print(f"by source line ({kind}, per frame):")
    for key, (dur, cnt) in line_rows[:top_n]:
        print(f"{dur/denom:9.2f} us  x{cnt/denom:6.2f}  {key}")
    print()

    print(f"top {top_n} ops by device time ({kind}, per frame):")
    for name, dur, cnt in rows[:top_n]:
        head, src = meta_of(name)
        print(f"{dur/denom:9.2f} us  x{cnt/denom:6.2f}  {name}")
        print(f"           {head[:150]}")
        if src:
            print(f"           @ {src}")
    total = sum(d for _, d, _ in rows)
    print(f"\nnon-wrapper device total: {total/denom:.1f} us/frame over "
          f"{sum(c for *_, c in rows)/denom:.0f} thunks/frame")


if __name__ == "__main__":
    main()
