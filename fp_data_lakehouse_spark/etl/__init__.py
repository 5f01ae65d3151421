"""Transcript ELT pipeline: raw transcript text -> star schema -> derived
semester fact (the reference's entire ETL surface, Spark-first).

Stages (medallion):
- bronze: raw per-document text (``doc_id``, ``text``)
- silver: star schema — 4 dims + Fact_Nilai_MK (``star``)
- gold:   Fact_Nilai_Semester (``semester``) + the 29 insight queries
          (``insights``)
"""

from .extract import extract_courses, extract_students, split_valid_invalid
from .semester import build_fact_nilai_semester
from .star import NILAI_BOBOT, build_star_schema

__all__ = [
    "extract_students",
    "extract_courses",
    "split_valid_invalid",
    "build_star_schema",
    "build_fact_nilai_semester",
    "NILAI_BOBOT",
]
