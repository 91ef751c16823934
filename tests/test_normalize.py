"""Unit tests for normalizers and IL1-flex comparators (M4-M8)."""

from pdf_parser_ray.kernels.normalize import (
    clean_label_sequence,
    expected,
    letters_only,
    letters_only_upper,
    normalize_text,
    ocr_norm,
)


class TestNormalizeText:
    def test_separators_removed(self):
        assert normalize_text("Packs/Day") == "PACKSDAY"
        assert normalize_text("High Blood-Pressure") == "HIGHBLOODPRESSURE"

    def test_edge_trim_non_alpha(self):
        assert normalize_text("(Asthma):") == "ASTHMA"
        assert normalize_text("12345") == ""

    def test_interior_digits_kept(self):
        # Edge trim only strips the edges; interior digits survive.
        assert normalize_text("L1ver") == "L1VER"

    def test_control_chars_dropped(self):
        assert normalize_text("Dia\x00betes") == "DIABETES"


class TestCleanLabelSequence:
    def test_joins_normalized(self):
        assert clean_label_sequence(["Liver", "Problems"]) == "LIVERPROBLEMS"


class TestOcrNorm:
    def test_preserves_punct_except_separators(self):
        assert ocr_norm("Packs/Day") == "PACKSDAY"
        assert ocr_norm("reminders?") == "REMINDERS?"


class TestLettersOnly:
    def test_case_preserved(self):
        assert letters_only("Surgeries:") == "Surgeries"
        assert letters_only_upper("a.b-c1") == "ABC"


class TestFlex:
    def test_equal_plain(self):
        assert expected("ASTHMA").equal("asthma")
        assert not expected("ASTHMA").equal("asthm")

    def test_il1_mask_accepts_L_l_1(self):
        e = expected("Liver")
        assert e.equal("LIVER")
        assert e.equal("L1VER")
        assert e.equal("LLVER")
        assert e.equal("LlVER")
        assert not e.equal("LXVER")

    def test_il1_mask_rejects_lower_i(self):
        # Reference accepts only I/L/l/1 at masked positions — a raw
        # lowercase 'i' is rejected (response_extractor.py:71).
        e = expected("Liver")
        assert not e.equal("LiVER")

    def test_digit_one_in_expected_not_masked(self):
        e = expected("A1B")
        assert e.equal("a1b")
        assert not e.equal("aIb")

    def test_contains_sliding(self):
        e = expected("ARE")
        assert e.contains("CARE")          # contains allows mid-string
        assert not e.startswith("CARE")    # startswith does not
        assert e.startswith("AREYOU")      # joined tokens allowed

    def test_empty_expected(self):
        e = expected("")
        assert e.contains("anything")
        assert e.startswith("anything")
        assert e.equal("")

    def test_slash_symmetry(self):
        # 'Packs/Day' question vs OCR token 'PACKS/DAY' — both sides
        # strip the separator trio (response_extractor.py:348-363).
        assert expected("Packs/Day").equal(ocr_norm("Packs/Day"))
