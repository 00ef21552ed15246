"""Typed-array annotations for the public API.

Reference contract: mvadapter/utils/typing.py — jaxtyping re-exports plus
the common typing names, used with runtime checking enabled in tests
(SURVEY.md §5.2). jaxtyping natively supports jnp arrays, so the shim is
thinner than the reference's torch variant.
"""

from typing import (  # noqa: F401
    Any,
    Callable,
    Dict,
    Iterable,
    List,
    Literal,
    NamedTuple,
    NewType,
    Optional,
    Sequence,
    Sized,
    Tuple,
    Type,
    TypeVar,
    Union,
)

try:
    from jaxtyping import (  # noqa: F401
        Bool,
        Complex,
        Float,
        Inexact,
        Int,
        Integer,
        Num,
        Shaped,
        UInt,
        jaxtyped,
    )

    HAS_JAXTYPING = True
except ImportError:  # pragma: no cover
    HAS_JAXTYPING = False
