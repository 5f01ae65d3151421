"""Deterministic transcript-text fixture generator (FIXTURES.md §B).

~40 documents mimicking the flattened PDF layout the reference regexes
parse (reference ETL_FINAL.py:149-190), with the full coverage matrix:
reject path (missing NRP anchor), missing-field defaults, courses before
and after the 'Tahap: Sarjana' marker, Gs/Gn codes, section codes of
length 0-2, 1-2 letter grades, an unknown grade letter, retakes, never-
retaken D/E failures, single-term students. Seed fixed -> byte-stable.
"""

from __future__ import annotations

import random

GRADES = ["A", "AB", "B", "BC", "C", "D", "E"]

COURSE_POOL = [
    ("ES123401", "Kalkulus 1", 3),
    ("ES123402", "Fisika Dasar", 4),
    ("ES123403", "Kimia Dasar", 3),
    ("EE234501", "Basis Data", 3),
    ("EE234502", "Struktur Data", 4),
    ("SM234503", "Statistika", 3),
    ("SM234504", "Aljabar Linier", 3),
    ("IF345601", "Pemrograman Lanjut", 4),
    ("IF345602", "Jaringan Komputer", 3),
    ("KM456701", "Manajemen Proyek", 2),
    ("ES123405", "Logika Matematika", 2),
    ("EE234506", "Sistem Operasi", 3),
]

TERMS = [(2023, "Gs"), (2023, "Gn"), (2024, "Gs"), (2024, "Gn")]

SECTIONS = ["A", "B", "AB", ""]


def _course_line(rng: random.Random, kode: str, nama: str, sks: int, tahun: int, code: str, grade: str) -> str:
    section = rng.choice(SECTIONS)
    return f"{kode} {nama} {sks} {tahun}/{code}/{section} {grade}"


def make_documents(n_students: int = 36, n_malformed: int = 4, seed: int = 42):
    """Returns list of (doc_id, text). First n_students parse cleanly,
    the rest lack the NRP/Nama anchor (reject path)."""
    rng = random.Random(seed)
    docs: list[tuple[str, str]] = []

    for i in range(n_students):
        serial = i * 7 % 232 + 1  # spreads across all jalur bins
        nrp = f"5026{21 + i % 3}1{serial:03d}"
        nama = f"Mahasiswa {chr(65 + i % 26)}{i}"
        if i == 1:
            nama += " "  # trailing space seen in real logs; regex strips it

        # term span: most students 3-4 terms; two students exactly one term
        n_terms = 1 if i in (7, 13) else rng.randint(2, 4)
        terms = TERMS[:n_terms]

        persiapan_lines, sarjana_lines = [], []
        taken: list[tuple[str, int, str, int, str]] = []
        for t_idx, (tahun, code) in enumerate(terms):
            stage_is_sarjana = t_idx >= len(terms) // 2 and len(terms) > 1
            n_courses = rng.randint(4, 6)
            picks = rng.sample(COURSE_POOL, n_courses)
            for kode, nama_mk, sks in picks:
                grade = rng.choice(GRADES)
                # student 3 carries an unknown grade letter (weight 0.0 path)
                if i == 3 and kode == picks[0][0] and t_idx == 0:
                    grade = "T"
                line = _course_line(rng, kode, nama_mk, sks, tahun, code, grade)
                (sarjana_lines if stage_is_sarjana else persiapan_lines).append(line)
                taken.append((kode, sks, grade, tahun, code))

        # guaranteed retakes: students 0-4 retake their first course in the
        # last term with a passing grade; students 5-7 leave a D/E unfixed.
        if i <= 4 and len(terms) >= 2:
            kode, sks, _, _, _ = taken[0]
            nama_mk = next(nm for k, nm, s in COURSE_POOL if k == kode)
            tahun, code = terms[-1]
            sarjana_lines.append(_course_line(rng, kode, nama_mk, sks, tahun, code, "A"))
        if 5 <= i <= 7:
            kode, nama_mk, sks = COURSE_POOL[(i * 3) % len(COURSE_POOL)]
            tahun, code = terms[0]
            persiapan_lines.append(_course_line(rng, kode, nama_mk, sks, tahun, code, rng.choice(["D", "E"])))

        sks_tempuh = sum(s for _, s, _, _, _ in taken)
        sks_lulus = sum(s for _, s, g, _, _ in taken if g not in ("D", "E"))
        parts = [f"NRP / Nama {nrp} / {nama} SKS Tempuh / SKS Lulus {sks_tempuh} / {sks_lulus}"]
        if i != 11:  # student 11: IPK line missing -> default 0.0
            parts.append(f"IPK {rng.randint(200, 399) / 100:.2f}")
        if i != 12:  # student 12: Status line missing -> default '-'
            parts.append(f"Status {'Aktif' if i % 5 else 'Cuti'} ---")
        parts.append("Tahap: Persiapan")
        parts.append(f"Total Sks Tahap Persiapan : {rng.randint(18, 36)}")
        if i != 14:  # student 14: stage-GPA lines missing -> default 0.0
            parts.append(f"IP Tahap Persiapan : {rng.randint(0, 400) / 100:.2f}")
        parts.extend(persiapan_lines)
        if sarjana_lines or i % 4 != 2:
            parts.append("Tahap: Sarjana")
            parts.append(f"total sks tahap sarjana : {rng.randint(30, 90)}")  # (?i) path
            if i != 14:
                parts.append(f"IP Tahap Sarjana : {rng.randint(0, 400) / 100:.2f}")
            parts.extend(sarjana_lines)
        docs.append((f"doc_{i:03d}", "\n".join(parts)))

    for j in range(n_malformed):
        docs.append(
            (
                f"bad_{j:03d}",
                f"Halaman transkrip rusak {j}\nIPK 3.00\nTidak ada anchor di sini",
            )
        )
    return docs
