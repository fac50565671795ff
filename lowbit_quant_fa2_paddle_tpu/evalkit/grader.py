"""Answer extraction + grading (reference inferenceKit grader.py, 268 LoC:
latex/sympy numeric equivalence). Core numeric path re-implemented; sympy
symbolic equivalence is used when available (sympy ships with the jax
stack's dependencies in many images) and degrades to string/float compare."""

from __future__ import annotations

import re
from typing import Optional

try:
    import sympy  # type: ignore

    HAVE_SYMPY = True
except Exception:  # pragma: no cover
    sympy = None
    HAVE_SYMPY = False

_NUM = re.compile(r"-?\d[\d,]*(?:\.\d+)?")


def extract_answer(text: str) -> Optional[str]:
    """Final answer: '#### x' (GSM8K), '\\boxed{x}' (MATH), else the last
    number in the text (reference grader conventions)."""
    m = re.search(r"####\s*([^\n]+)", text)
    if m:
        return m.group(1).strip().rstrip(".")
    m = re.search(r"\\boxed\{([^{}]+)\}", text)
    if m:
        return m.group(1).strip()
    nums = _NUM.findall(text)
    return nums[-1] if nums else None


def _to_float(s: str) -> Optional[float]:
    try:
        return float(s.replace(",", "").replace("$", "").strip())
    except (ValueError, AttributeError):
        return None


def grade_numeric(pred: Optional[str], gold: Optional[str], tol: float = 1e-6) -> bool:
    """Numeric-or-symbolic equivalence (reference grader.py math_equal)."""
    if pred is None or gold is None:
        return False
    pf, gf = _to_float(pred), _to_float(gold)
    if pf is not None and gf is not None:
        return abs(pf - gf) <= tol * max(1.0, abs(gf))
    if pred.strip() == gold.strip():
        return True
    if HAVE_SYMPY:
        try:
            return sympy.simplify(
                sympy.sympify(pred) - sympy.sympify(gold)
            ) == 0
        except Exception:
            return False
    return False
