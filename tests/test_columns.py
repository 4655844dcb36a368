"""Pure string/column-matching tests, ported from the reference's own suite
(``tabular/columns.py:147-219``) — same assertions, our implementation."""

from feldman_spark.formats.columns import (
    ColumnIdentity,
    find_unit,
    las,
    lowerstrip,
    map_columns,
    space_caps,
    split_caps,
    strip_unit,
)


def test_strip_unit():
    assert strip_unit("Column") == "Column"
    assert strip_unit("Column(m)") == "Column"
    assert strip_unit("Column()") == "Column"
    assert strip_unit("(m)Column") == "Column"
    assert strip_unit("Column(crazy-units&xxx#*(&$)") == "Column"
    assert strip_unit("Column (a) (b)") == "Column  "  # does not strip spaces


def test_find_unit():
    assert find_unit("Column") is None
    assert find_unit("Column()") is None
    assert find_unit("Column(m)") == "m"
    assert find_unit("Column (counts/sec)") == "counts/sec"
    assert find_unit("Column(crazy-units&xxx#*(&$)") == "crazy-units&xxx#*(&$"


def test_lowerstrip():
    assert lowerstrip("columnname") == "columnname"
    assert lowerstrip("Column Name") == "columnname"
    assert lowerstrip(" Column Name ") == "columnname"


def test_las():
    assert las("Column (counts/sec)") == "column"
    assert las("  Column (counts/sec) () ") == "column"


def test_space_caps():
    assert space_caps("AbeBobCarl") == "Abe Bob Carl"
    assert space_caps("abeBobcarL") == "abe Bobcar L"
    assert space_caps("noupper") == "noupper"
    assert space_caps("Abe Bob") == "Abe Bob"
    assert space_caps("Abraham") == "Abraham"
    assert space_caps("") == ""


def test_split_caps():
    assert split_caps("AbeBobCarl") == ["Abe", "Bob", "Carl"]
    assert split_caps("abeBobcarL") == ["abe", "Bobcar", "L"]
    assert split_caps("noupper") == ["noupper"]
    assert split_caps("ABC") == ["ABC"]
    assert split_caps("Abe Bob") == ["Abe", "Bob"]
    assert split_caps("Abe    Bob") == ["Abe", "Bob"]
    assert split_caps("") == [""]


def test_map_columns():
    foo = ColumnIdentity("Foo", ["Fu", "Phooey"])
    bar = ColumnIdentity("Bar", ["Bear", "Tavern"])
    baz = ColumnIdentity("Baz", ["Bizarre", "Boz"])
    fmt = [foo, bar, baz]
    assert len(map_columns(fmt, ["Foo", "Bar", "Baz"])) == 3
    # synonyms, funky case, spacing, units
    assert len(map_columns(fmt, [" phooey ", "TAVERN (m)", "biz arre"])) == 3


def test_pretty_name():
    col = ColumnIdentity("ShortA", [], {"A": "Pretty A Name", "IODP": "Purty B Name"})
    assert col.pretty_name("A") == "Pretty A Name"
    assert col.pretty_name() == "Purty B Name"
    col.org_names = {}
    assert col.pretty_name() == "Short A"
