"""Device-platform selection for the CLI apps.

The reference apps bind a CUDA device at startup (cudaGLSetGLDevice,
apps/src/preview.cpp:107-112); the JAX analog is picking a platform before
the first device query. Some environments pin ``JAX_PLATFORMS`` at the
interpreter level (e.g. a TPU-tunnel sitecustomize), where the env var alone
is ignored — ``jax.config.update`` is the authoritative switch, so this
helper always sets both.
"""

from __future__ import annotations

import os


def force_platform(name: str | None) -> None:
    """Force the JAX platform ('cpu', 'tpu', ...). No-op when name is falsy.

    Must run before any `jax.devices()` / first trace in the process.
    """
    if not name:
        return
    os.environ["JAX_PLATFORMS"] = name
    import jax

    jax.config.update("jax_platforms", name)


def add_platform_flag(parser) -> None:
    """Attach the shared --platform flag to an app's argparser."""
    parser.add_argument(
        "--platform", default=None, metavar="NAME",
        help="force the JAX platform (e.g. 'cpu' to render off-device; "
             "default: the environment's backend)",
    )
