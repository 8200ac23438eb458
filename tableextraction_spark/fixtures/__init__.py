from .generate import gen_doc, gen_corpus, PAGE_W, PAGE_H

__all__ = ["gen_doc", "gen_corpus", "PAGE_W", "PAGE_H"]
