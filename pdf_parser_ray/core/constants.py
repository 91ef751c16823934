"""Geometric thresholds of the extraction semantics.

Values mirror the reference's ``constants.py`` (the "physics constants"
of the pipeline — reference ``constants.py:10-69``). All coordinates are
integer pixels in the reference's 300-DPI space.
"""

# Minimum vertical offset after a section anchor before labels/questions
# are searched (reference constants.py:10).
ANCHOR_OFFSET_PX: int = 40

RENDER_DPI: int = 300  # reference constants.py:13

# Template matching / detection (reference constants.py:16-17).
TEMPLATE_THRESHOLD_DEFAULT: float = 0.6
DEDUPE_MAX_DIST: int = 5

# Label/question multiline matcher tolerances (reference constants.py:20-21).
LABEL_MULTILINE_BASE_X_TOLERANCE: int = 160
LABEL_MULTILINE_MAX_LOOKAHEAD: int = 5

# Checkbox row clustering and alignment (reference constants.py:24-25).
LABEL_ROW_GAP_PX: int = 50
LABEL_CB_ASSIGN_MAX_DELTA_Y: int = 60

# Section detection and geometry (reference constants.py:28-31).
SECTION_CB_MAX_GAP_PX: int = 100
SECTION_X1: int = 0
SECTION_X2: int = 2000
SECTION_BOTTOM_BUFFER_PX: int = 50

# Answer extraction (reference constants.py:34-41).
ANSWER_COL_GAP_PX: int = 5
ANSWER_PAGE_RIGHT_MARGIN_PX: int = 20
ANSWER_ROW_Y_TOLERANCE_PX: int = 12
ANSWER_MIN_LINE_HEIGHT_PX: int = 6
ANSWER_MAX_VERTICAL_GAP_PX: int = 1_000
ANSWER_STOP_ON_BLANK: bool = True
ANSWER_LEFT_MARGIN_PX: int = 30
ANSWER_BLANK_LINE_GAP_PX: int = 45

# Answer continuation window (reference constants.py:49-50).
ANSWER_CONTINUATION_MIN_DELTA_Y: int = 10
ANSWER_CONTINUATION_MAX_DELTA_Y: int = 50

# Yes/No highlighted answer recovery (reference constants.py:53-56).
YESNO_SLIDE_OFFSETS: list[int] = [4, 8, 12, 16, 20, 24, 28, 32, 36, 40, 44]
YESNO_PROBE_MAX_BANDS: int = 2
YESNO_HIGHLIGHT_CONFIDENCE: float = 0.95
YESNO_INFERRED_CONFIDENCE: float = 0.80

# Highlight-recovery crop padding (reference response_extractor.py:833-834).
YESNO_PAD_X: int = 15
YESNO_PAD_Y: int = 12

# Default synthetic page geometry (stands in for 300-DPI page renders).
DEFAULT_PAGE_WIDTH: int = 2000
DEFAULT_PAGE_HEIGHT: int = 3000
