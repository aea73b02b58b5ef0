"""PII scrubbing: typed redaction + audit counts, columnar."""

from docvault_ocr_service_spark.functions.pii import scrub_pii


def test_scrub_pii_types_and_order(spark):
    rows = [
        (1, "mail me at jan.kowalski+x@firma.com.pl or call "
            "+48 22 123 45 67 today"),
        (2, "server 10.0.12.9 and card 4111 1111 1111 1111 leaked"),
        (3, "no pii here, just text with numbers 42 and 7"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}

    r1 = got[1]
    assert r1["n_email"] == 1 and r1["n_phone"] == 1
    assert "<EMAIL>" in r1["text_clean"] and "<PHONE>" in r1["text_clean"]
    assert "firma.com.pl" not in r1["text_clean"]
    assert "123 45 67" not in r1["text_clean"]

    r2 = got[2]
    assert r2["n_ipv4"] == 1 and r2["n_card"] == 1
    # the card AND the ip are also phone-shaped (digits + dots/spaces):
    # counts are per-pattern on the original text, but redaction order
    # means <CARD>/<IP> win the bytes
    assert r2["n_phone"] == 2
    assert "<CARD>" in r2["text_clean"] and "<IP>" in r2["text_clean"]
    assert "4111" not in r2["text_clean"]

    r3 = got[3]
    assert (r3["n_email"], r3["n_card"], r3["n_ipv4"], r3["n_phone"]) \
        == (0, 0, 0, 0)
    assert r3["text_clean"] == rows[2][1]

    assert got[4]["text_clean"] is None          # null passes through
