"""Publish AOT artifacts from the working cache into the git-tracked store.

The working cache (``.jax_cache/export``) is gitignored, so a fresh clone
starts cold. Copying the current artifacts into ``aot_store/`` (tracked)
ships them with the repo.

Only ``.jaxexport`` StableHLO modules are published: they are
host-portable and deserialized through jax.export's versioned format.
``.jaxexec`` executables stay in the working cache — they are pickle
blobs (a git-tracked pickle is an arbitrary-code-execution vector, being
unreviewable in diffs) AND host-specific (embedded XLA:CPU AOT code for
the compiling machine's CPU features; loading on a different host caused
the round-4 benchmark crash). ``aot._lookup`` enforces the same rule on
the read side.

The content-addressed names (package hash + jax/jaxlib versions +
platform + closure-data fingerprints, see utils/aot.py) make a stale hit
unlikely by construction; anything the key cannot see (out-of-package
monkeypatching) is on the publisher.

    python scripts/publish_aot.py          # copy new exports into aot_store/
    python scripts/publish_aot.py --prune  # also drop store files whose key no
                                           # longer matches any cache artifact
                                           # name (stale package fingerprints)
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gigalens_tpu.utils import aot


def main():
    src = aot.cache_dir()
    dst = aot.store_dir()
    dst.mkdir(parents=True, exist_ok=True)
    fresh = sorted(p for p in src.glob("*.jaxexport"))
    copied = 0
    for p in fresh:
        target = dst / p.name
        if not target.exists() or target.stat().st_size != p.stat().st_size:
            shutil.copy2(p, target)
            copied += 1
            print(f"publish {p.name} ({p.stat().st_size/1e6:.1f} MB)")
    if "--prune" in sys.argv:
        keep = {p.name for p in fresh}
        for p in sorted(dst.glob("*")):
            if p.name not in keep and p.name != "README.md":
                p.unlink()
                print(f"prune {p.name}")
    total = sum(p.stat().st_size for p in dst.glob("*"))
    print(f"{copied} new artifact(s); store now {total/1e6:.1f} MB")


if __name__ == "__main__":
    main()
