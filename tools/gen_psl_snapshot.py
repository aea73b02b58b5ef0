"""Generate docvault_ocr_service_spark/data/public_suffix_list.dat.

A curated ~700-rule snapshot of the Mozilla Public Suffix List
(publicsuffix.org/list/ — MPL 2.0; the list itself is public data),
written in the PSL's own file format (``//`` comments, ``*.`` wildcard
rules, ``!`` exception rules).  Re-run this script to regenerate the
file deterministically; the runtime loader (functions/web.py) parses
the generated file, so swapping in a verbatim upstream
public_suffix_list.dat is a drop-in upgrade.

Only multi-label rules are listed: the PSL's implicit default rule
``*`` (every unlisted TLD is a public suffix, registrable = last two
labels) is what the engine's fallback already implements.
"""

from __future__ import annotations

import os

# ICANN-section families: {tld: "sld sld ..."} — each entry expands to
# "sld.tld" normal rules.
FAMILIES = {
    "uk": "ac co gov ltd me net nhs org plc police",
    "jp": "ac ad co ed go gr lg ne or "
          # the 47 prefectures are explicit PSL rules
          "aichi akita aomori chiba ehime fukui fukuoka fukushima "
          "gifu gunma hiroshima hokkaido hyogo ibaraki ishikawa iwate "
          "kagawa kagoshima kanagawa kochi kumamoto kyoto mie miyagi "
          "miyazaki nagano nagasaki nara niigata oita okayama okinawa "
          "osaka saga saitama shiga shimane shizuoka tochigi "
          "tokushima tokyo tottori toyama wakayama yamagata yamaguchi "
          "yamanashi",
    "au": "com net org edu gov asn id act nsw nt qld sa tas vic wa",
    "nz": "ac co cri geek gen govt health iwi kiwi maori mil net org "
          "parliament school",
    "br": "adv agr am arq art bio blog bmd cim cng cnt com coop ecn "
          "edu emp eng esp etc eti far flog fm fnd fot fst g12 ggf "
          "gov imb ind inf jor jus leg lel mat med mil mus net nom "
          "not ntr odo org ppg pro psc psi qsl radio rec slg srv "
          "taxi teo tmp trd tur tv vet vlog wiki zlg",
    "cn": "ac com edu gov mil net org ah bj cq fj gd gs gx gz ha hb "
          "he hi hl hn jl js jx ln nm nx qh sc sd sh sn sx tj xj xz "
          "yn zj",
    "in": "ac co edu firm gen gov ind mil net nic org res",
    "kr": "ac co es go hs kg mil ms ne or pe re sc busan chungbuk "
          "chungnam daegu daejeon gangwon gwangju gyeongbuk gyeonggi "
          "gyeongnam incheon jeju jeonbuk jeonnam seoul ulsan",
    "za": "ac agric alt co edu gov law mil net ngo nom org school "
          "tm web",
    "ua": "com edu gov net org cherkassy chernigov crimea "
          "dnepropetrovsk donetsk dp if kharkov kherson khmelnitskiy "
          "kiev kirovograd km kr ks lg lugansk lutsk lviv mk "
          "nikolaev od odessa pl poltava rovno rv sebastopol sumy te "
          "ternopil uzhgorod vinnica vn zaporizhzhe zhitomir zp zt",
    "ar": "com edu gob gov int mil musica net org tur",
    "mx": "com edu gob net org",
    "at": "ac co gv or priv",
    "pl": "com net org edu gov mil aid agro atm auto biz gmina gsm "
          "info mail miasta media nieruchomosci nom pc powiat priv "
          "realestate rel sex shop sklep sos szkola targi tm tourism "
          "travel turystyka "
          "waw warszawa wroc wroclaw krakow katowice poznan lodz gda "
          "gdansk gdynia sopot szczecin lublin bialystok olsztyn "
          "torun bydgoszcz rzeszow kielce opole",
    "ru": "ac com edu gov int mil net org pp test",
    "fr": "aeroport asso avocat cci com gouv medecin nom notaires "
          "pharmacien port prd tm veterinaire",
    "it": "edu gov",
    "tr": "av bbs bel biz com dr edu gen gov info k12 mil name net "
          "org pol tel tsk tv web",
    "tw": "club com ebiz edu game gov idv mil net org",
    "hk": "com edu gov idv net org",
    "sg": "com edu gov net org per",
    "my": "com edu gov mil name net org",
    "th": "ac co go in mi net or",
    "vn": "ac biz com edu gov health info int name net org pro",
    "id": "ac biz co desa go mil my net or sch web",
    "ph": "com edu gov i mil net ngo org",
    "il": "ac co gov idf k12 muni net org",
    "sa": "com edu gov med net org pub sch",
    "ae": "ac co gov mil net org sch",
    "eg": "com edu eun gov mil name net org sci",
    "ng": "com edu gov i mil mobi name net org sch",
    "ke": "ac co go info me mobi ne or sc",
    "tz": "ac co go hotel info me mil mobi ne or sc tv",
    "ug": "ac co com go ne or org sc",
    "gh": "com edu gov mil org",
    "zw": "ac co gov mil org",
    "ma": "ac co gov net org press",
    "tn": "com ens fin gov ind info intl nat net org perso tourism",
    "dz": "art asso com edu gov net org pol soc tm",
    "es": "com edu gob nom org",
    "pt": "com edu gov int net nome org publ",
    "gr": "com edu gov net org",
    "ro": "arts com firm info nom nt org rec store tm www",
    "hu": "co info org priv sport tm agrar bolt casino city erotica "
          "erotika film forum games hotel ingatlan jogasz konyvelo "
          "lakas media news reklam sex shop suli szex tozsde utazas "
          "video",
    "rs": "ac co edu gov in org",
    "by": "com gov mil of",
    "kz": "com edu gov mil net org",
    "uz": "co com net org",
    "pk": "biz com edu fam gob gok gon gop gos gov net org web",
    "lk": "ac assn com edu gov grp hotel int ltd net ngo org sch "
          "soc web",
    "mz": "ac adv co edu gov mil net org",
    "ve": "arts co com e12 edu firm gob gov info int mil net org rec "
          "store tec web",
    "pe": "com edu gob mil net nom org",
    "ec": "com edu fin gob gov info k12 med mil net org pro",
    "bo": "com edu gob int mil net org tv web",
    "py": "com coop edu gov mil net org",
    "uy": "com edu gub mil net org",
    "cl": "gob gov mil",
    "co": "arts com edu firm gov info int mil net nom org rec web",
    "cr": "ac co ed fi go or sa",
    "do": "art com edu gob gov mil net org sld web",
    "gt": "com edu gob ind mil net org",
    "hn": "com edu gob mil net org",
    "ni": "ac biz co com edu gob in info int mil net nom org web",
    "pa": "abo ac com edu gob ing med net nom org sld",
    "sv": "com edu gob org red",
    "mo": "com edu gov net org",
    "qa": "com edu gov mil name net org sch",
    "om": "com edu gov med museum net org pro",
    "jo": "com edu gov mil name net org sch",
    "lb": "com edu gov net org",
    "sy": "com edu gov mil net org",
    "iq": "com edu gov mil net org",
    "ir": "ac co gov id net org sch",
    "af": "com edu gov net org",
    "ye": "com edu gov mil net org",
    "bh": "com edu gov net org",
    "kw": "com edu emb gov ind net org",
    "ge": "com edu gov mil net org pvt",
    "am": "co com commune net org",
    "az": "biz com edu gov info int mil name net org pp pro",
    "me": "ac co edu gov its net org priv",
    "mk": "com edu gov inf name net org",
    "al": "com edu gov mil net org",
    "ba": "com edu gov net org",
    "gg": "co net org",
    "je": "co net org",
    "im": "ac co com net org tt tv",
    "mt": "com edu net org",
    "cy": "ac biz com ekloges gov ltd mil net org press pro tm",
    "us": "dc fed isa kids nsn "
          "ak al ar az ca co ct de fl ga gu hi ia id il in ks ky la "
          "ma md me mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or "
          "pa pr ri sc sd tn tx ut va vi vt wa wi wv wy as mp",
    "ca": "ab bc gc mb nb nf nl ns nt nu on pe qc sk yk",
}

# k12/cc/lib second-levels under each US state (k12.ca.us, lib.tx.us…)
US_STATES = ("ak al ar az ca co ct de fl ga hi ia id il in ks ky la "
             "ma md me mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok "
             "or pa ri sc sd tn tx ut va vt wa wi wv wy dc").split()

# wildcard rules: every label directly under the base is itself a
# public suffix
WILDCARDS = [
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg",
    "sch.uk",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
]

# exception rules: registrable despite a covering wildcard
EXCEPTIONS = [
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
]

# private-section (operator-submitted) rules — multi-tenant hosting
# platforms where sibling subdomains are unrelated parties
PRIVATE = [
    "blogspot.com", "wordpress.com", "tumblr.com", "weebly.com",
    "wixsite.com", "github.io", "githubusercontent.com", "gitlab.io",
    "glitch.me", "herokuapp.com", "appspot.com", "web.app",
    "firebaseapp.com", "netlify.app", "vercel.app", "pages.dev",
    "workers.dev", "cloudfront.net", "azurewebsites.net",
    "readthedocs.io", "fly.dev", "onrender.com", "surge.sh",
    "neocities.org", "amplifyapp.com", "repl.co",
    "s3.amazonaws.com",
]


def main() -> None:
    out = os.path.join(os.path.dirname(__file__), "..",
                       "docvault_ocr_service_spark", "data",
                       "public_suffix_list.dat")
    lines = [
        "// Curated snapshot of the Public Suffix List "
        "(publicsuffix.org/list/, MPL 2.0).",
        "// Multi-label rules only — unlisted TLDs fall to the PSL's",
        "// implicit default rule (*): registrable = last two labels.",
        "// Regenerate with tools/gen_psl_snapshot.py; a verbatim",
        "// upstream public_suffix_list.dat is a drop-in replacement.",
        "",
        "// ===BEGIN ICANN DOMAINS===",
    ]
    for tld in sorted(FAMILIES):
        for sld in sorted(set(FAMILIES[tld].split())):
            lines.append(f"{sld}.{tld}")
    for st in US_STATES:
        for sub in ("cc", "k12", "lib"):
            lines.append(f"{sub}.{st}.us")
    for w in sorted(WILDCARDS):
        lines.append(f"*.{w}")
    for e in sorted(EXCEPTIONS):
        lines.append(f"!{e}")
    lines.append("// ===END ICANN DOMAINS===")
    lines.append("// ===BEGIN PRIVATE DOMAINS===")
    lines.extend(sorted(PRIVATE))
    lines.append("// ===END PRIVATE DOMAINS===")
    with open(out, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    n_rules = sum(1 for l in lines if l and not l.startswith("//"))
    print(f"wrote {out}: {n_rules} rules")


if __name__ == "__main__":
    main()
