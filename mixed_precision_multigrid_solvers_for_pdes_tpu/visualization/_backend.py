"""Shared matplotlib setup: lazy import, headless-safe, consistent style."""

from __future__ import annotations

import os


def get_plt():
    import matplotlib

    if not os.environ.get("DISPLAY") and matplotlib.get_backend().lower() not in (
        "agg",
        "module://matplotlib_inline.backend_inline",
    ):
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def finish(fig, save=None, show: bool = False):
    """Common save/show epilogue; returns the figure."""
    if save:
        fig.savefig(save, dpi=150, bbox_inches="tight")
    if show:
        get_plt().show()
    return fig
