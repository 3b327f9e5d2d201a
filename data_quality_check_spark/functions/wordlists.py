"""Seed vocabulary per language (public common-word lists).

Used to (a) deterministically train the hashed char-n-gram language-ID and
perplexity models, (b) generate fixture captions, and (c) drive the SQL-expressible
stopword language heuristic over the `documents` table. All plain public knowledge —
no external data files.
"""

VOCAB: dict[str, list[str]] = {
    "en": (
        "the of and to in is was for on that with as his they at be this from have or "
        "by one had not but what all were when we there can an your which their said if "
        "do will each about how up out them then she many some so these would other into "
        "has more her two like him see time could no make than first been its who now "
        "people my made over did down only way find use may water long little very after "
        "word called just where most know"
    ).split(),
    "fr": (
        "le de un être et à il avoir ne je son que se qui ce dans en du elle au pour pas "
        "vous par sur faire plus dire me on mon lui nous comme mais pouvoir avec tout y "
        "aller voir bien où sans tu ou leur homme si deux mari moi vouloir te femme venir "
        "quand grand celui notre devoir là jour prendre même votre rien petit encore "
        "aussi quelque dont toujours sous"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als "
        "auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie "
        "einem über einen so zum war haben nur oder aber vor zur bis mehr durch man sein "
        "wurde sei während welche schon kann ihre dann unter wir soll ich eines jahr zwei "
        "diese wieder keine"
    ).split(),
    "es": (
        "de la que el en y a los del se las por un para con no una su al lo como más "
        "pero sus le ya o este sí porque esta entre cuando muy sin sobre también me "
        "hasta hay donde quien desde todo nos durante todos uno les ni contra otros ese "
        "eso ante ellos e esto mí antes algunos qué unos yo otro otras otra él tanto esa "
        "estos mucho quienes nada muchos"
    ).split(),
    "it": (
        "di e il la che a per un in una sono mi ho si lo ma ti le ci con su io questo "
        "qui hai del tu non più bene sei come cosa qua qualcosa ancora essere molto fare "
        "quando stato dove tutto loro anche chi solo due voglio della essa niente sempre "
        "così tutti mai quella mia prima adesso dopo senza può casa suo ora noi vita "
        "grazie stata fatto"
    ).split(),
    "pt": (
        "de a o que e do da em um para é com não uma os no se na por mais as dos como "
        "mas foi ao ele das tem à seu sua ou ser quando muito há nos já está eu também "
        "só pelo pela até isso ela entre era depois sem mesmo aos ter seus quem nas me "
        "esse eles estão você tinha foram essa num nem suas meu às minha têm numa pelos "
        "qual será"
    ).split(),
}

LANGS = sorted(VOCAB)

# small stopword subsets for the SQL-expressible stopword-hit heuristic
STOPWORDS: dict[str, list[str]] = {lang: words[:25] for lang, words in VOCAB.items()}

# mild toxicity lexicon for the scrub stage (placeholder-grade, deterministic)
TOXIC_WORDS = ["stupid", "idiot", "moron", "dumbass", "scumbag", "loser"]
