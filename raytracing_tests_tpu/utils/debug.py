"""Runtime validation: the TPU-native analogue of the reference's GL debug
callback + LOG_ASSERT invariants (``OpenGLDebug.cpp:40-46``, SURVEY.md §5).

jax is functional, so the equivalent discipline is: checkify'd renders that
turn NaN/Inf pixels into hard errors in tests, and lightweight finite-ness
audits for use at the end of training steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def check_finite_render(render_fn):
    """Wrap a render callable so non-finite outputs raise (debug builds).

    Usage::
        checked = check_finite_render(lambda: render(scene, cam, cfg))
        out = checked()   # raises checkify.JaxRuntimeError on NaN/Inf
    """

    def wrapped(*args, **kw):
        def body(*a, **k):
            out = render_fn(*a, **k)
            checkify.check(
                jnp.all(jnp.isfinite(out["image"])), "non-finite pixels in render"
            )
            checkify.check(
                jnp.all(jnp.isfinite(out["depth"])), "non-finite depth in render"
            )
            return out

        err, out = checkify.checkify(body)(*args, **kw)
        err.throw()
        return out

    return wrapped


def assert_finite_tree(tree, name: str = "pytree") -> None:
    """Hard host-side assert that every array leaf is finite (use between
    training steps; forces a sync)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise FloatingPointError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}"
                )


def nan_guard(x, label: str = "value"):
    """In-graph debug print when a tensor goes non-finite (jax.debug)."""
    bad = jnp.sum(~jnp.isfinite(x))
    jax.debug.print(
        "[nan_guard] {label}: {bad} non-finite of {total}",
        label=label,
        bad=bad,
        total=x.size,
    )
    return x
