from .youtube360 import ClipRecord, load_youtube360_csv, YouTube360Dataset
