"""Data-processing pipelines over the TPC-H-ish testdata tables.

Each public function here backs one ``queries()`` entry in ``__ray_entry__``
(driver correctness gate): it takes ``sf_dir`` and returns a Ray Dataset /
Arrow table whose columns match the paired ``oracle_sql()`` statement.
These re-express the reference's query/data-processing surface (SURVEY.md
§2.5-2.6: anti-join patch jobs, grouped distinct, dedup, cleaning, keying)
plus the training-data operators (dedup families, similarity search, text
analysis) over generic tables.
"""
