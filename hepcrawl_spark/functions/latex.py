"""Minimal LaTeX -> text conversion (C3).

The reference (hepcrawl/parsers/arxiv.py:49-91, 398-403) runs pylatexenc with
``math_mode="verbatim"`` (``$...$`` spans pass through untouched), unknown
macros/environments kept verbatim, a custom ``\\sqrt`` -> ``√(...)`` handler,
and a final ``"  " -> " "`` collapse.

pylatexenc is not available in this environment, so this module implements
the same *observable contract on the fixture corpus*: math verbatim, a small
macro table outside math, unknown constructs kept verbatim, double-space
collapse. The golden tests in tests/test_parsers_arxiv.py pin byte-identical
output per fixture url.
"""

from __future__ import annotations

import re

_GREEK = {
    "alpha": "α", "beta": "β", "gamma": "γ", "delta": "δ", "epsilon": "ε",
    "zeta": "ζ", "eta": "η", "theta": "θ", "iota": "ι", "kappa": "κ",
    "lambda": "λ", "mu": "μ", "nu": "ν", "xi": "ξ", "pi": "π", "rho": "ρ",
    "sigma": "σ", "tau": "τ", "upsilon": "υ", "phi": "φ", "chi": "χ",
    "psi": "ψ", "omega": "ω",
    "Gamma": "Γ", "Delta": "Δ", "Theta": "Θ", "Lambda": "Λ", "Xi": "Ξ",
    "Pi": "Π", "Sigma": "Σ", "Upsilon": "Υ", "Phi": "Φ", "Psi": "Ψ",
    "Omega": "Ω",
}

_ACCENTS = {
    "'": {"a": "á", "e": "é", "i": "í", "o": "ó", "u": "ú", "y": "ý",
          "A": "Á", "E": "É", "I": "Í", "O": "Ó", "U": "Ú", "c": "ć",
          "n": "ń", "s": "ś", "z": "ź"},
    "`": {"a": "à", "e": "è", "i": "ì", "o": "ò", "u": "ù",
          "A": "À", "E": "È", "I": "Ì", "O": "Ò", "U": "Ù"},
    '"': {"a": "ä", "e": "ë", "i": "ï", "o": "ö", "u": "ü", "y": "ÿ",
          "A": "Ä", "E": "Ë", "I": "Ï", "O": "Ö", "U": "Ü"},
    "^": {"a": "â", "e": "ê", "i": "î", "o": "ô", "u": "û",
          "A": "Â", "E": "Ê", "I": "Î", "O": "Ô", "U": "Û"},
    "~": {"a": "ã", "n": "ñ", "o": "õ", "A": "Ã", "N": "Ñ", "O": "Õ"},
}

_SIMPLE_MACROS = {
    "ss": "ß", "ae": "æ", "AE": "Æ", "oe": "œ", "OE": "Œ",
    "o": "ø", "O": "Ø", "aa": "å", "AA": "Å", "l": "ł", "L": "Ł",
    "dag": "†", "ddag": "‡", "S": "§", "P": "¶", "copyright": "©",
    "pounds": "£", "ldots": "…", "dots": "…", "times": "×", "pm": "±",
    "mp": "∓", "cdot": "⋅", "infty": "∞", "leq": "≤", "geq": "≥",
    "neq": "≠", "approx": "≈", "sim": "∼", "rightarrow": "→",
    "leftarrow": "←", "Rightarrow": "⇒", "Leftarrow": "⇐", "to": "→",
    "hbar": "ℏ", "ell": "ℓ", "partial": "∂", "nabla": "∇", "deg": "°",
}
_SIMPLE_MACROS.update(_GREEK)

_MATH_SPAN = re.compile(r"\$\$.*?\$\$|\$[^$]*\$", re.DOTALL)
# \macro{arg} | \macro | \'{e} | \'e
_MACRO = re.compile(
    r"\\(sqrt)\s*\{([^{}]*)\}"        # 1,2: \sqrt{...}
    r"|\\([a-zA-Z]+)"                 # 3:   \word (source spacing preserved)
    r"|\\(['`\"^~])\{?([a-zA-Z])\}?"  # 4,5: accents
)


def _convert_nonmath(seg: str) -> str:
    def repl(m: re.Match) -> str:
        if m.group(1):  # \sqrt{arg}
            arg = m.group(2)
            return f"√{arg}" if arg.startswith("(") else f"√({arg})"
        if m.group(3):
            word = m.group(3)
            return _SIMPLE_MACROS.get(word, m.group(0))
        acc, letter = m.group(4), m.group(5)
        return _ACCENTS.get(acc, {}).get(letter, m.group(0))

    return _MACRO.sub(repl, seg)


def latex_to_unicode(text: str) -> str:
    """Best-effort LaTeX -> text; ``$...$`` math verbatim; unknowns verbatim."""
    if text is None:
        return None
    out: list[str] = []
    pos = 0
    for m in _MATH_SPAN.finditer(text):
        out.append(_convert_nonmath(text[pos:m.start()]))
        out.append(m.group(0))  # math verbatim
        pos = m.end()
    out.append(_convert_nonmath(text[pos:]))
    return "".join(out).replace("  ", " ")
