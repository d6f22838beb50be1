#!/usr/bin/env python
"""Persistent TPU experiment shell.

The axon tunnel charges ~2-4 MINUTES for the first dispatch of every
process (PERF_NOTES.md rule 3), so kernel iteration must happen inside ONE
long-lived process.  This worker watches a queue directory for numbered
python snippets, execs each in a persistent namespace, and writes the
captured stdout + traceback next to it:

    echo 'print(1+1)' > /tmp/tpuq/001.py      # producer (the agent)
    cat /tmp/tpuq/001.out                     # result when it appears

State (imports, compiled functions, device arrays) persists across
snippets.  `001.err` is written instead if the snippet raised.
"""

import io
import os
import sys
import time
import traceback

QDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuq"
os.makedirs(QDIR, exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compilation cache — kernels iterate fast across worker restarts
os.environ.setdefault("JAX_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

G = {"__name__": "__tpu_shell__"}

print("tpu_shell ready; devices:", jax.devices(), flush=True)
with open(os.path.join(QDIR, "READY"), "w") as f:
    f.write(repr(jax.devices()))

done = set()
while True:
    names = sorted(n for n in os.listdir(QDIR)
                   if n.endswith(".py") and n not in done)
    for n in names:
        path = os.path.join(QDIR, n)
        with open(path) as f:
            src = f.read()
        out = io.StringIO()
        old = sys.stdout
        sys.stdout = out
        t0 = time.time()
        err = None
        try:
            exec(compile(src, path, "exec"), G)
        except BaseException:
            err = traceback.format_exc()
        finally:
            sys.stdout = old
        dur = time.time() - t0
        suffix = ".err" if err else ".out"
        with open(path[:-3] + suffix + ".tmp", "w") as f:
            f.write(out.getvalue())
            if err:
                f.write("\n" + err)
            f.write(f"\n[wall {dur:.2f}s]\n")
        os.rename(path[:-3] + suffix + ".tmp", path[:-3] + suffix)
        done.add(n)
        print(f"ran {n} in {dur:.2f}s err={bool(err)}", flush=True)
    time.sleep(0.3)
