"""Experiment-directory scaffolding and figure export helpers.

Parity with reference gumbi/utils/generic_utils.py:9-66.
"""

import os
import pathlib as pl

__all__ = ["setup_paths", "savefig"]


def setup_paths(make_missing=True):
    """Return (base, code, data, results, figures) paths for an experiment layout.

    The current working directory is treated as the Code directory; Data,
    Results, and Figures are siblings under the parent.
    """
    code_pth = pl.Path(os.getcwd())
    base_pth = code_pth.parent
    data_pth = base_pth / "Data"
    rslt_pth = base_pth / "Results"
    fig_pth = base_pth / "Figures"
    if make_missing:
        for p in (data_pth, rslt_pth, fig_pth):
            p.mkdir(parents=True, exist_ok=True)
    return base_pth, code_pth, data_pth, rslt_pth, fig_pth


def savefig(filename: str, fig=None, path=None, silent=False, **kwargs):
    """Save a figure as 300-dpi transparent .png plus .svg."""
    import matplotlib.pyplot as plt

    fig = plt.gcf() if fig is None else fig
    path = setup_paths(make_missing=False)[-1] if path is None else path

    kwargs.setdefault("bbox_inches", "tight")
    kwargs.setdefault("transparent", True)

    if not silent:
        print("Saving.", end="")
    fig.savefig(path / (filename + ".png"), dpi=300, **kwargs)
    if not silent:
        print(".", end="")
    fig.savefig(path / (filename + ".svg"), **kwargs)
    if not silent:
        print("Done")
