from hepcrawl_spark.functions.latex import latex_to_unicode
from hepcrawl_spark.functions.text import (
    coll_cleanforthe_py,
    collapse_initials_py,
    collapse_whitespace_py,
    range_as_string_py,
    split_fullname_py,
)


def test_collapse_whitespace():
    assert collapse_whitespace_py("  a \n\t b  ") == "a b"


def test_collapse_initials():
    assert collapse_initials_py("T. A.") == "T.A."
    assert collapse_initials_py("R. W.-X.") == "R.W.X."  # hyphen between initials
    assert collapse_initials_py("Tom Alpha") == "Tom Alpha"


def test_split_fullname_comma():
    assert split_fullname_py("Doe, John Par") == ("Doe", "John Par")


def test_split_fullname_nocomma():
    assert split_fullname_py("John Doe") == ("Doe", "John")
    assert split_fullname_py("") == ("", "")


def test_coll_cleanforthe():
    # collaboration phrase stripped
    coll, author = coll_cleanforthe_py(" the Planck Collaboration ")
    assert coll == "Planck"
    assert author is None
    # 'for the' splits author from collaboration
    coll, author = coll_cleanforthe_py("J. Smith for the ATLAS Collaboration")
    assert coll == "ATLAS"
    assert author == "J. Smith"
    # institutes untouched
    coll, author = coll_cleanforthe_py("Institute for Physics")
    assert coll == "Institute for Physics"


def test_range_as_string():
    assert range_as_string_py(["1981", "1982", "1985"]) == "1981-1982, 1985"
    assert range_as_string_py(["2000"]) == "2000"
    assert range_as_string_py(["1", "2", "3"]) == "1-3"


def test_latex_math_verbatim():
    assert latex_to_unicode(r"all $\delta^2$ terms") == r"all $\delta^2$ terms"


def test_latex_macros_outside_math():
    assert latex_to_unicode(r"\alpha decay") == "α decay"
    assert latex_to_unicode(r"\sqrt{2}") == "√(2)"
    assert latex_to_unicode(r"G\"unter") == "Günter"


def test_latex_unknown_verbatim():
    assert latex_to_unicode(r"\unknowncmd{x} y") == r"\unknowncmd{x} y"
