from hepcrawl_spark.functions.urls import canonicalize_url_py


def test_lowercase_scheme_host():
    assert canonicalize_url_py("HTTP://ExAmPle.COM/Path") == "http://example.com/Path"


def test_default_port_stripped():
    assert canonicalize_url_py("https://a.com:443/x") == "https://a.com/x"
    assert canonicalize_url_py("http://a.com:80/x") == "http://a.com/x"
    assert canonicalize_url_py("http://a.com:8080/x") == "http://a.com:8080/x"


def test_fragment_removed():
    assert canonicalize_url_py("http://a.com/x#frag") == "http://a.com/x"


def test_query_sorted():
    assert canonicalize_url_py("http://a.com/?b=2&a=1") == "http://a.com/?a=1&b=2"


def test_blank_query_values_kept():
    assert canonicalize_url_py("http://a.com/?a=&b=1") == "http://a.com/?a=&b=1"


def test_empty_path():
    assert canonicalize_url_py("http://a.com") == "http://a.com/"


def test_percent_encoding_uppercased():
    assert canonicalize_url_py("http://a.com/%7efoo") == "http://a.com/~foo"


def test_idempotent():
    u = "HTTPS://X.org:443/a b?z=1&y=2#f"
    once = canonicalize_url_py(u)
    assert canonicalize_url_py(once) == once
