"""Generate Jupyter notebooks from the example scripts — the notebook-form
counterpart of the reference's `examples/*.ipynb` workflows (which cannot
be executed here without the datasets; the generated notebooks run the
same synthetic-data workflows as the scripts).

Each `examples/<name>.py` becomes `examples/<name>.ipynb`: the module
docstring becomes a markdown cell; top-level code is split into code cells
at blank-line-separated section boundaries; the `main()` body is inlined
(dedented) so the notebook executes top-to-bottom like a notebook should.

Run:  python tools/gen_notebooks.py
"""
import ast
import json
import os
import sys
import textwrap

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
EXAMPLES = ("movielens_style", "instacart_style", "features_and_weights",
            "mesh_training")


def _cells_from_source(src):
    """(markdown_doc, [code_cell_sources]) from an example script."""
    tree = ast.parse(src)
    lines = src.splitlines()
    doc = ast.get_docstring(tree) or ""

    segments = []
    for node in tree.body:
        if (isinstance(node, ast.Expr)
                and isinstance(node.value, ast.Constant)
                and isinstance(node.value.value, str)):
            continue  # module docstring
        if isinstance(node, ast.FunctionDef) and node.name == "main":
            body_start = node.body[0].lineno - 1
            body_end = node.end_lineno
            body = "\n".join(lines[body_start:body_end])
            segments.append(("code", textwrap.dedent(body)))
        elif (isinstance(node, ast.If)
              and getattr(getattr(node.test, "left", None), "id", "")
              == "__name__"):
            continue  # drop the __main__ guard (main() was inlined)
        else:
            seg = "\n".join(lines[node.lineno - 1:node.end_lineno])
            segments.append(("code", seg))

    # split each segment into readable cells at blank-line boundaries
    # BETWEEN its top-level statements (ast-derived, so multi-line
    # constructs and indented blocks never split); comments between
    # statements attach to the following cell
    cells = []
    for _, seg in segments:
        cells.extend(_split_statements(seg))
    # merge tiny fragments forward
    merged = []
    for c in cells:
        if merged and len(merged[-1]) + len(c) < 200:
            merged[-1] = merged[-1] + "\n" + c
        else:
            merged.append(c)
    return doc, merged


def _split_statements(seg):
    try:
        t = ast.parse(seg)
    except SyntaxError:
        return [seg.strip("\n")]
    slines = seg.splitlines()
    bounds = [(n.lineno - 1, n.end_lineno) for n in t.body]
    cells, cur_start = [], 0
    for k in range(1, len(bounds)):
        gap = slines[bounds[k - 1][1]:bounds[k][0]]
        if any(not g.strip() for g in gap):          # blank line between
            # comments in the gap lead the NEXT cell
            lead = bounds[k][0]
            while lead > bounds[k - 1][1] and \
                    slines[lead - 1].strip().startswith("#"):
                lead -= 1
            cells.append("\n".join(slines[cur_start:bounds[k - 1][1]]))
            cur_start = lead
    cells.append("\n".join(slines[cur_start:]))
    return [c.strip("\n") for c in cells if c.strip()]


def _nb(doc, code_cells, name):
    cells = [{
        "cell_type": "markdown", "metadata": {},
        "source": [f"# {name}\n", "\n"] + [ln + "\n" for ln in doc.splitlines()],
    }]
    for c in code_cells:
        cells.append({
            "cell_type": "code", "execution_count": None, "metadata": {},
            "outputs": [],
            "source": [ln + "\n" for ln in c.splitlines()],
        })
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def generate(name):
    path = os.path.join(REPO, "examples", f"{name}.py")
    with open(path) as fh:
        src = fh.read()
    doc, cells = _cells_from_source(src)
    return _nb(doc, cells, name.replace("_", " "))


def strip_outputs(nb):
    """Structural form of a notebook: outputs/execution counts removed.
    The currency test compares THIS form, so executed notebooks (cell
    outputs committed as evidence, like the reference's examples) stay
    'current' as long as their code cells match the scripts."""
    import copy

    nb = copy.deepcopy(nb)
    # execution enriches notebook-level metadata (kernel version, pygments
    # lexer, ...) and stamps cell ids — none of it is structure
    nb["metadata"] = {
        "kernelspec": {"display_name": "Python 3",
                       "language": "python", "name": "python3"},
        "language_info": {"name": "python"},
    }
    for c in nb["cells"]:
        # normalize source to a list of lines (nbformat round-trips may
        # store it as one string)
        if isinstance(c.get("source"), str):
            c["source"] = c["source"].splitlines(keepends=True)
        c.pop("id", None)
        if c["cell_type"] == "code":
            c["outputs"] = []
            c["execution_count"] = None
            c.get("metadata", {}).pop("execution", None)
    return nb


def execute(nb, timeout=3600):
    """Run the notebook top-to-bottom (cwd=repo root) and return it with
    real cell outputs — the executed-evidence form the reference's
    notebooks carry (`/root/reference/examples/movielens.ipynb`)."""
    import nbformat
    from nbclient import NotebookClient

    node = nbformat.from_dict(nb)
    for c in node.cells:  # nbclient expects one source string per cell
        if isinstance(c.source, list):
            c.source = "".join(c.source)
    client = NotebookClient(node, timeout=timeout, kernel_name="python3",
                            resources={"metadata": {"path": REPO}})
    client.execute()
    return json.loads(nbformat.writes(node))


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or EXAMPLES
    for name in names:
        nb = generate(name)
        out = os.path.join(REPO, "examples", f"{name}.ipynb")
        if "--check" in sys.argv:
            with open(out) as fh:
                if strip_outputs(json.load(fh)) != nb:
                    sys.stderr.write(f"{out} is stale\n")
                    sys.exit(1)
            continue
        if "--execute" in sys.argv:
            print(f"executing {name}...", flush=True)
            nb = execute(nb)
        else:
            # keep committed outputs when only regenerating: if the on-disk
            # notebook already matches the script structurally, leave its
            # executed outputs in place
            try:
                with open(out) as fh:
                    on_disk = json.load(fh)
                if strip_outputs(on_disk) == nb:
                    continue
            except (OSError, json.JSONDecodeError):
                pass
        with open(out, "w") as fh:
            json.dump(nb, fh, indent=1)
        n_code = sum(1 for c in nb["cells"] if c["cell_type"] == "code")
        print(f"wrote examples/{name}.ipynb ({n_code} code cells)")
    if "--check" in sys.argv:
        print("notebooks are current")


if __name__ == "__main__":
    main()
