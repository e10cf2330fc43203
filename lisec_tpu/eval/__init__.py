"""Offline evaluation (host-side): detection matching and KITTI AP
(O15, SURVEY.md §2.3)."""
