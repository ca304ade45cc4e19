"""Generate docs/api.md from the live public API.

A lightweight stand-in for the reference's Sphinx autodoc site (reference
docs/ builds with sphinx; this environment has no sphinx install): walks the
public surface of ``gumbi_tpu``, records signatures and docstring summaries,
and writes one browsable markdown file. Re-run after API changes:

    python tools/gen_api_docs.py
"""

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import gumbi_tpu as gmb  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "api.md")

# Public classes/functions in presentation order (layer order, bottom-up)
SECTIONS = [
    (
        "Tabular data & standardization (`gumbi_tpu.aggregation`)",
        [gmb.Standardizer, gmb.DataSet, gmb.WideData, gmb.TidyData],
    ),
    (
        "Structured arrays (`gumbi_tpu.arrays`)",
        [
            gmb.LayeredArray,
            gmb.ParameterArray,
            gmb.UncertainArray,
            gmb.UncertainParameterArray,
            gmb.MVUncertainParameterArray,
            gmb.stack,
            gmb.vstack,
            gmb.hstack,
            gmb.make_deltas_parray,
        ],
    ),
    (
        "Regression (`gumbi_tpu.models`)",
        [gmb.Regressor, gmb.GP, gmb.GPC],
    ),
    (
        "Visualization (`gumbi_tpu.plotting`)",
        [gmb.ParrayPlotter],
    ),
]

ENGINE_MODULES = [
    ("gumbi_tpu.ops.kernels", "Kernel library (GPSpec, gram, coregionalization)"),
    ("gumbi_tpu.ops.mll", "Marginal log-likelihood & MAP objective"),
    ("gumbi_tpu.ops.linalg", "Custom-VJP linear algebra"),
    ("gumbi_tpu.ops.optimize", "Multi-restart L-BFGS"),
    ("gumbi_tpu.ops.priors", "Priors & constrained-InverseGamma fitting"),
    ("gumbi_tpu.ops.posterior", "Posterior caches & prediction"),
    ("gumbi_tpu.ops.kronecker", "Kronecker multi-output fast path"),
    ("gumbi_tpu.ops.fitc", "Sparse FITC approximation"),
    ("gumbi_tpu.ops.acquisition", "Bayesian-optimization acquisitions"),
    ("gumbi_tpu.ops.laplace", "Laplace approximation (classifier)"),
    ("gumbi_tpu.ops.ess", "Elliptical slice sampling (latent full-Bayes)"),
    ("gumbi_tpu.ops.hmc", "Adaptive HMC over hyperparameters"),
    ("gumbi_tpu.parallel", "Mesh sharding: restart/data-parallel fits, distributed Cholesky"),
]


def first_line(obj):
    doc = inspect.getdoc(obj) or ""
    return doc.split("\n")[0].strip()


def sig_of(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def class_entry(cls, lines):
    lines.append(f"### `{cls.__name__}`\n")
    summary = inspect.getdoc(cls) or ""
    para = summary.split("\n\n")[0].replace("\n", " ").strip()
    if para:
        lines.append(para + "\n")
    methods = []
    for name, m in inspect.getmembers(cls):
        if name.startswith("_") or not (inspect.isfunction(m) or isinstance(m, property)):
            continue
        if isinstance(m, property):
            methods.append((name, "property", first_line(m.fget) if m.fget else ""))
        else:
            if m.__qualname__.split(".")[0] != cls.__name__:
                continue  # inherited from elsewhere; documented on the owner
            methods.append((name, f"`{name}{sig_of(m)}`", first_line(m)))
    if methods:
        lines.append("| member | summary |")
        lines.append("|---|---|")
        for name, shown, doc in methods:
            cell = shown if shown != "property" else f"`{name}` *(property)*"
            lines.append(f"| {cell} | {doc} |")
        lines.append("")


def fn_entry(fn, lines):
    lines.append(f"### `{fn.__name__}{sig_of(fn)}`\n")
    lines.append(first_line(fn) + "\n")


def main():
    lines = [
        "# API reference",
        "",
        "Generated from live docstrings by `tools/gen_api_docs.py` — regenerate",
        "after API changes. The user-facing surface is `import gumbi_tpu as gmb`;",
        "the engine modules at the bottom are stable but lower-level.",
        "",
        "Aliases: `gmb.parray = ParameterArray`, `gmb.uarray = UncertainArray`,",
        "`gmb.uparray = UncertainParameterArray`, `gmb.mvuparray =",
        "MVUncertainParameterArray`.",
        "",
    ]
    for title, objs in SECTIONS:
        lines.append(f"## {title}\n")
        for obj in objs:
            if inspect.isclass(obj):
                class_entry(obj, lines)
            else:
                fn_entry(obj, lines)

    lines.append("## Engine modules (`gumbi_tpu.ops`, `gumbi_tpu.parallel`)\n")
    lines.append("| module | role | public names |")
    lines.append("|---|---|---|")
    import importlib

    for modname, role in ENGINE_MODULES:
        mod = importlib.import_module(modname)
        names = getattr(mod, "__all__", None) or [
            n
            for n, o in vars(mod).items()
            if not n.startswith("_")
            and callable(o)
            and getattr(o, "__module__", "") == modname
        ]
        if not names:  # package re-exporting from submodules
            names = [
                n
                for n, o in vars(mod).items()
                if not n.startswith("_")
                and callable(o)
                and getattr(o, "__module__", "").startswith(modname)
            ]
        lines.append(f"| `{modname}` | {role} | {', '.join(f'`{n}`' for n in sorted(names)[:12])} |")
    lines.append("")

    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
