"""Execute the example notebooks in place so they ship with outputs.

The reference's notebooks carry executed outputs (residual panels, chi^2,
R-hat) as de-facto acceptance evidence (``/root/reference/jax-demo.ipynb``
cells 3-9); a gallery without results is scaffolding. Run after regenerating
via gen_gallery_nbs.py / gen_quickstart_nb.py:

    GIGALENS_NB_PLATFORM=cpu python scripts/run_notebooks.py cluster inversion
    python scripts/run_notebooks.py quickstart          # real scene, on-chip

Each notebook's first code cell honors GIGALENS_NB_PLATFORM (the env var is
inherited by the kernel), so CI can pin the quick configs to CPU while the
quickstart runs the real scene on the accelerator.
"""
import os
import sys
import time

import nbformat
from nbclient import NotebookClient

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ALL = ["cluster", "inversion", "shapelets", "quickstart"]


def run(name, timeout):
    path = os.path.join(_REPO_ROOT, "examples", f"{name}.ipynb")
    nb = nbformat.read(path, as_version=4)
    t0 = time.time()
    client = NotebookClient(
        nb, timeout=timeout, kernel_name="python3",
        resources={"metadata": {"path": _REPO_ROOT}},
    )
    client.execute()
    nbformat.write(nb, path)
    n_out = sum(1 for c in nb.cells if c.cell_type == "code" and c.get("outputs"))
    print(f"{name}: executed in {time.time()-t0:.0f}s, "
          f"{n_out} cells with outputs -> {path}", flush=True)


def main():
    names = sys.argv[1:] or ALL
    timeout = int(os.environ.get("GIGALENS_NB_TIMEOUT", "3600"))
    for name in names:
        run(name, timeout)


if __name__ == "__main__":
    main()
