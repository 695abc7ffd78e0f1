"""Canonical character inventories (reference `english_corpus.py:19`, `german_corpus.py:14`)."""
import string

english_frequent_characters = list(string.ascii_lowercase + " '")
german_frequent_characters = english_frequent_characters + list("äöüß")
