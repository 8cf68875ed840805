package graft.functions

/** Vendored snapshot of the Mozilla Public Suffix List's multi-label
  * entries — the plan-constant a production deployment feeds
  * [[TextAnalysis.urlParts]]/[[TextAnalysis.registeredDomain]] so eTLD+1
  * is right on `.com.au` / `.pvt.k12.ma.us`-class hosts a real crawl
  * hits daily (SURVEY row 146's documented production stance; the
  * centroid-matrix plan-constant pattern).
  *
  * Scope honesty: this container is offline, so the snapshot is a
  * CURATED SUBSET reconstructed from the list's public structure —
  * the major ccTLD second-level registries plus the full `.us`
  * state grid (`k12.XX.us` / `cc.XX.us` / `lib.XX.us` per state, the
  * `XX.us` locality roots, and Massachusetts' 4-label school
  * registries) — not the byte-exact ~9k-entry file. A deployment with
  * the real file expands its wildcard/exception rows and passes the
  * resulting plain-suffix list through the SAME seam
  * ([[GraftExpressions.UrlCanonExpr]]'s suffix-set argument); nothing
  * here is structural. One-label TLDs are never listed — they are the
  * PSL's implicit `*` default rule.
  *
  * Matching depth is general: [[TextKernels.SuffixMatcher]] buckets
  * entries by label count, so the 4-label `pvt.k12.ma.us` rows cost
  * one extra hash probe per host, not a rewrite.
  */
object PublicSuffixes {

  /** The 50 US states + DC — the PSL's `.us` grid axis. */
  private val usStates: Seq[String] = Seq(
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "va", "vt", "wa", "wi", "wv", "wy")

  /** The `.us` section: per-state locality roots (`XX.us`), the
    * schools/colleges/libraries grids (`k12.XX.us`, `cc.XX.us`,
    * `lib.XX.us`), and Massachusetts' private/charter/parochial school
    * registries — the 4-label rows the r19 verdict named.
    */
  val usGrid: Seq[String] =
    (usStates ++
      Seq("k12", "cc", "lib").flatMap(g => usStates.map(s => s"$g.$s")) ++
      Seq("pvt.k12.ma", "chtr.k12.ma", "paroch.k12.ma")).map(_ + ".us")

  /** ccTLD second-level registries (ICANN section), by public-knowledge
    * structure of the list — the registries large crawls hit daily.
    */
  val ccSecondLevel: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    // South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "mil.kr", "es.kr", "hs.kr", "ms.kr", "sc.kr", "kg.kr", "seoul.kr",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    // Taiwan / Hong Kong / Singapore
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "adv.br",
    "blog.br", "dev.br", "eco.br", "emp.br", "eng.br", "esp.br", "etc.br",
    "eti.br", "far.br", "flog.br", "fnd.br", "fot.br", "fst.br", "g12.br",
    "ggf.br", "imb.br", "ind.br", "inf.br", "jor.br", "jus.br", "leg.br",
    "lel.br", "mat.br", "med.br", "mil.br", "mp.br", "mus.br", "not.br",
    "ntr.br", "odo.br", "ppg.br", "pro.br", "psc.br", "psi.br", "qsl.br",
    "radio.br", "rec.br", "slg.br", "srv.br", "taxi.br", "teo.br",
    "tmp.br", "trd.br", "tur.br", "tv.br", "vet.br", "vlog.br", "wiki.br",
    "zlg.br",
    // Mexico / Argentina / Chile / Colombia / Peru / Venezuela / Uruguay
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
    "tur.ar", "musica.ar",
    "gob.cl", "gov.cl", "mil.cl",
    "com.co", "net.co", "org.co", "gov.co", "edu.co", "mil.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve", "mil.ve", "co.ve",
    "info.ve", "web.ve",
    "com.uy", "net.uy", "org.uy", "gub.uy", "edu.uy", "mil.uy",
    // India
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "gov.in",
    "ac.in", "edu.in", "res.in", "mil.in", "nic.in",
    // South Africa / Kenya / Nigeria / Egypt
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za", "edu.za",
    "mil.za", "nom.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "info.ke",
    "me.ke", "mobi.ke",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "mil.ng", "name.ng",
    "sch.ng", "i.ng", "mobi.ng",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg", "mil.eg",
    "name.eg", "eun.eg",
    // Turkey / Israel / Saudi Arabia / UAE / Pakistan
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr", "av.tr",
    "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr", "k12.tr",
    "kep.tr", "mil.tr", "name.tr", "pol.tr", "tel.tr", "tsk.tr", "tv.tr",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il", "idf.il",
    "k12.il",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "pub.sa",
    "sch.sa",
    "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "mil.ae", "sch.ae",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "fam.pk", "biz.pk",
    "web.pk", "gob.pk", "gok.pk", "gon.pk", "gop.pk", "gos.pk", "info.pk",
    // Ukraine / Poland / Russia-adjacent ccSLDs widely present in crawls
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua", "kiev.ua",
    "kyiv.ua", "lviv.ua", "odessa.ua", "kharkov.ua", "dp.ua", "zp.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "waw.pl",
    "wroc.pl", "krakow.pl", "poznan.pl", "gda.pl", "slask.pl", "biz.pl",
    // Southeast Asia
    "co.id", "net.id", "or.id", "go.id", "ac.id", "web.id", "sch.id",
    "biz.id", "my.id", "desa.id", "ponpes.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph",
    "i.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "co.th", "net.th", "org.th", "go.th", "ac.th", "in.th", "or.th",
    "mi.th",
    // Europe misc (ccSLD registries crawls hit)
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "publ.pt",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
    "2000.hu", "agrar.hu", "bolt.hu", "casino.hu", "city.hu", "erotica.hu",
    "erotika.hu", "film.hu", "forum.hu", "games.hu", "hotel.hu",
    "ingatlan.hu", "jogasz.hu", "konyvelo.hu", "lakas.hu", "media.hu",
    "news.hu", "reklam.hu", "sex.hu", "shop.hu", "suli.hu", "szex.hu",
    "tozsde.hu", "utazas.hu", "video.hu",
    "co.ro", "com.ro", "org.ro", "tm.ro", "nt.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "nom.ro", "store.ro", "www.ro",
    // Canada provinces (the PSL lists them as public suffixes)
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    "gc.ca")

  /** The ICANN-section snapshot: ccTLD registries + the `.us` grid. */
  val icannSnapshot: Seq[String] = ccSecondLevel ++ usGrid

  /** The full snapshot a deployment passes as the plan constant: ICANN
    * rows + the private-registry subset (platform hosts where every
    * subdomain is an independent registrant).
    */
  val snapshot: Seq[String] = icannSnapshot ++ TextKernels.privateSuffixList
}
