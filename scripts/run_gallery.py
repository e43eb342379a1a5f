"""Execute the notebook gallery in place so cells ship with outputs.

The reference's notebooks ship executed (jax-demo.ipynb cells 3-9 carry the
chi^2 residual panels and R-hat tables that serve as its de-facto acceptance
evidence); this runs ours the same way and writes outputs back into
examples/*.ipynb.

    python scripts/run_gallery.py [names...]   # default: all four

Platform per notebook comes from GIGALENS_NB_PLATFORM (the notebooks read it
themselves); pass --cpu to force cpu for the listed notebooks.
"""
import os
import sys
import time

import nbformat
from nbclient import NotebookClient

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ALL = ["quickstart", "cluster", "inversion", "shapelets"]


def run(name, timeout=3600):
    # the package lives at the repo root (not pip-installed); the kernel runs
    # with cwd=examples/, so it needs the root on PYTHONPATH
    os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get(
        "PYTHONPATH", "")
    path = os.path.join(_REPO_ROOT, "examples", f"{name}.ipynb")
    nb = nbformat.read(path, as_version=4)
    t0 = time.time()
    client = NotebookClient(
        nb, timeout=timeout, kernel_name="python3",
        resources={"metadata": {"path": os.path.join(_REPO_ROOT, "examples")}},
    )
    client.execute()
    nbformat.write(nb, path)
    n_out = sum(1 for c in nb.cells if c.get("outputs"))
    print(f"{name}: executed in {time.time() - t0:.0f}s, "
          f"{n_out} cells with outputs -> {path}", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if "--cpu" in sys.argv:
        os.environ["GIGALENS_NB_PLATFORM"] = "cpu"
    for name in args or _ALL:
        run(name)
