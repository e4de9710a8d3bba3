"""Generate docs/reference.md from live docstrings (the autodoc equivalent
of the reference's Sphinx site, `/root/reference/docs/source/rankfm.rst:4`).

Run:  python tools/gen_api_docs.py          # rewrite docs/reference.md
      python tools/gen_api_docs.py --check  # exit 1 if the file is stale

tests/test_docs.py runs the --check mode so the committed reference can
never drift from the code.
"""
import inspect
import os
import sys
import textwrap

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HEADER = """\
# API reference (generated)

Auto-generated from docstrings by `tools/gen_api_docs.py` — do not edit by
hand. For the annotated guide (parameter tables, dispatch rules, examples)
see [api.md](api.md).
"""


def _sig(fn):
    try:
        return str(inspect.signature(fn))
    except (TypeError, ValueError):
        return "(...)"


def _doc(obj):
    d = inspect.getdoc(obj)
    return d.strip() if d else "*(no docstring)*"


def _fn_block(name, fn, level="###"):
    return f"{level} `{name}{_sig(fn)}`\n\n{_doc(fn)}\n"


def _class_block(cls, public_methods):
    out = [f"## `{cls.__module__.split('.')[0]}.{cls.__name__}`\n"]
    out.append(_doc(cls) + "\n")
    out.append(_fn_block(f"{cls.__name__}", cls.__init__, level="###")
               .replace("(self, ", "(", 1).replace("(self)", "()", 1))
    for m in public_methods:
        fn = inspect.getattr_static(cls, m)
        if isinstance(fn, classmethod):
            fn = fn.__func__
            sig = _sig(fn).replace("(cls, ", "(", 1)
            out.append(f"### `{cls.__name__}.{m}{sig}` *(classmethod)*"
                       f"\n\n{_doc(fn)}\n")
        elif isinstance(fn, property):
            out.append(f"### `{cls.__name__}.{m}` *(property)*"
                       f"\n\n{_doc(fn)}\n")
        else:
            sig = _sig(fn).replace("(self, ", "(", 1).replace(
                "(self)", "()", 1)
            out.append(f"### `{cls.__name__}.{m}{sig}`\n\n{_doc(fn)}\n")
    return "\n".join(out)


def generate():
    from rankfm_tpu import RankFM, evaluation
    from rankfm_tpu.utils import checkpoint, data, observe
    from rankfm_tpu.parallel import mesh as pmesh, retrieval, train as ptrain

    parts = [HEADER]
    parts.append(_class_block(RankFM, [
        "fit", "fit_partial", "predict", "recommend",
        "similar_items", "similar_users", "save", "load",
        "user_items",
    ]))

    parts.append("## `rankfm_tpu.evaluation`\n\n" + _doc(evaluation) + "\n")
    for name in ("hit_rate", "reciprocal_rank", "discounted_cumulative_gain",
                 "precision", "recall", "diversity", "compute"):
        parts.append(_fn_block(f"evaluation.{name}",
                               getattr(evaluation, name)))

    parts.append("## `rankfm_tpu.utils`\n")
    parts.append(_fn_block("utils.data.get_data", data.get_data))
    parts.append(_fn_block("utils.checkpoint.save_model",
                           checkpoint.save_model))
    parts.append(_fn_block("utils.checkpoint.load_model",
                           checkpoint.load_model))
    for name in ("trace", "device_memory_stats"):
        if hasattr(observe, name):
            parts.append(_fn_block(f"utils.observe.{name}",
                                   getattr(observe, name)))

    parts.append("## `rankfm_tpu.parallel`\n\n"
                 + (_doc(sys.modules["rankfm_tpu.parallel"])
                    if sys.modules.get("rankfm_tpu.parallel") else "") + "\n")
    parts.append(_fn_block("parallel.mesh.make_mesh", pmesh.make_mesh))
    parts.append(_fn_block("parallel.mesh.init_distributed",
                           pmesh.init_distributed))
    parts.append(_fn_block("parallel.train.make_sharded_epoch_fn",
                           ptrain.make_sharded_epoch_fn))
    parts.append(_fn_block("parallel.retrieval.make_sharded_recommend",
                           retrieval.make_sharded_recommend))

    body = "\n".join(parts)
    # normalize: strip trailing spaces, single trailing newline
    body = "\n".join(line.rstrip() for line in body.splitlines()) + "\n"
    return body


def main():
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "reference.md")
    body = generate()
    if "--check" in sys.argv:
        with open(path) as fh:
            on_disk = fh.read()
        if on_disk != body:
            sys.stderr.write("docs/reference.md is stale — run "
                             "`python tools/gen_api_docs.py`\n")
            sys.exit(1)
        print("docs/reference.md is current")
        return
    with open(path, "w") as fh:
        fh.write(body)
    print(f"wrote {os.path.normpath(path)} ({len(body.splitlines())} lines)")


if __name__ == "__main__":
    main()
