"""rewrite_uri (S18) golden parity with the reference's own test matrix
(tests/specializations/stores/test_bluebrain_nexus.py:343-418, context
fixture :167-173)."""

import pytest

from nexus_forge_spark.functions.uri import rewrite_uri

ENDPOINT = "https://nexus-instance.org"
BUCKET = "test/kgforge"
CONTEXT = {
    "@context": {
        "@base": "http://data.net",
        "@vocab": "http://vocab.net",
        "datashapes": "https://neuroshapes.org/dash/",
    }
}

CASES = [
    # (uri, is_file, expected)
    ("myverycoolid123456789", True,
     "https://nexus-instance.org/files/test/kgforge/myverycoolid123456789"),
    ("http://data.net/myverycoolid123456789", False,
     "https://nexus-instance.org/resources/test/kgforge/_/http%3A%2F%2Fdata.net%2Fmyverycoolid123456789"),
    ("http://data.net/07ed2dab-587a-4144-90c7-4cdd252cfa3f", True,
     "https://nexus-instance.org/files/test/kgforge/http%3A%2F%2Fdata.net%2F07ed2dab-587a-4144-90c7-4cdd252cfa3f"),
    ("https://nexus-instance.org/files/test/kgforge/myverycoolid123456789", True,
     "https://nexus-instance.org/files/test/kgforge/http%3A%2F%2Fdata.net%2Fmyverycoolid123456789"),
    ("https://nexus-instance.org/resources/test/kgforge/datashapes:example/43edd8bf-5dfe-45cd-b6d8-1a604dd6beca",
     False,
     "https://nexus-instance.org/resources/test/kgforge/https%3A%2F%2Fneuroshapes.org%2Fdash%2Fexample/http%3A%2F%2Fdata.net%2F43edd8bf-5dfe-45cd-b6d8-1a604dd6beca"),
    ("https://nexus-instance.org/resources/test/kgforge/_/43edd8bf-5dfe-45cd-b6d8-1a604dd6beca",
     False,
     "https://nexus-instance.org/resources/test/kgforge/_/http%3A%2F%2Fdata.net%2F43edd8bf-5dfe-45cd-b6d8-1a604dd6beca"),
    ("https://nexus-instance.org/files/test/kgforge/http%3A%2F%2Fdata.net%2F632a7644-b07e-4fcd-a537-9162e3444106",
     True,
     "https://nexus-instance.org/files/test/kgforge/http%3A%2F%2Fdata.net%2F632a7644-b07e-4fcd-a537-9162e3444106"),
    ("https://nexus-instance.org/resources/test/kgforge/_/http%3A%2F%2Fdata.net%2F43edd8bf-5dfe-45cd-b6d8-1a604dd6beca",
     False,
     "https://nexus-instance.org/resources/test/kgforge/_/http%3A%2F%2Fdata.net%2F43edd8bf-5dfe-45cd-b6d8-1a604dd6beca"),
]


@pytest.mark.parametrize("uri,is_file,expected", CASES)
def test_rewrite_uri_golden(uri, is_file, expected):
    assert rewrite_uri(ENDPOINT, BUCKET, uri, CONTEXT, is_file=is_file) == expected
