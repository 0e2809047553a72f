"""Dump the optimized HLO of the compiled denoise step and summarize the
fusions around proj_out / ff dot_generals (the profile shows them at only
48-65 TF/s, ~4x below the conv kernels — this tells us what XLA actually
fused there and what layout it chose).

Usage: python scripts/dump_step_hlo.py [/tmp/step_hlo.txt]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jaxcache")


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) )
    from scripts.profile_step import build_run
    run, _steps = build_run()
    lowered = run.fn.lower(*run.args, **run.kwargs)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {out_path}", flush=True)


if __name__ == "__main__":
    main()
