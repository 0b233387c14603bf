"""String / hash / domain / email UDFs (SURVEY.md §2.3).

Everything here compiles to built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) except the unicode-table normalizers, which are
Arrow-vectorized pandas UDFs — the vectorized replacement for the
reference's row-at-a-time Python UDFs.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..compiler.values import Value
from .registry import arg, const_arg, register


@register("StringLength")
def string_length(ctx, call, args):
    """ref: stdlib/udfs/string.py:25."""
    return Value(col=F.length(arg(ctx, call, args, "s").col), dtype="int")


@register("StringToLower")
def string_to_lower(ctx, call, args):
    """ref: stdlib/udfs/string.py:32."""
    return Value(col=F.lower(arg(ctx, call, args, "s").col), dtype="str")


@register("StringToUpper")
def string_to_upper(ctx, call, args):
    """ref: stdlib/udfs/string.py:39."""
    return Value(col=F.upper(arg(ctx, call, args, "s").col), dtype="str")


@register("StringStartsWith")
def string_starts_with(ctx, call, args):
    """ref: stdlib/udfs/string.py:51."""
    s = arg(ctx, call, args, "s")
    sub = args.get("substring") or args.get("sub") or args.get("prefix")
    if sub is None:
        raise ctx.error("StringStartsWith requires substring=", call.span)
    return Value(col=s.col.startswith(sub.col), dtype="bool")


@register("StringEndsWith")
def string_ends_with(ctx, call, args):
    """ref: stdlib/udfs/string.py:62."""
    s = arg(ctx, call, args, "s")
    sub = args.get("substring") or args.get("sub") or args.get("suffix")
    if sub is None:
        raise ctx.error("StringEndsWith requires substring=", call.span)
    return Value(col=s.col.endswith(sub.col), dtype="bool")


def _strip(ctx, call, args, side: str) -> Value:
    s = arg(ctx, call, args, "s")
    chars = const_arg(ctx, call, args, "chars", required=False)
    if chars is None:
        fn = {"both": F.trim, "left": F.ltrim, "right": F.rtrim}[side]
        return Value(col=fn(s.col), dtype="str")
    cls = "[" + re.escape(chars).replace("\\", "\\\\") + "]+"
    col = s.col
    if side in ("both", "left"):
        col = F.regexp_replace(col, "^" + cls, "")
    if side in ("both", "right"):
        col = F.regexp_replace(col, cls + "$", "")
    return Value(col=col, dtype="str")


@register("StringStrip")
def string_strip(ctx, call, args):
    """ref: stdlib/udfs/string.py:73."""
    return _strip(ctx, call, args, "both")


@register("StringLStrip")
def string_lstrip(ctx, call, args):
    """ref: stdlib/udfs/string.py:87."""
    return _strip(ctx, call, args, "left")


@register("StringRStrip")
def string_rstrip(ctx, call, args):
    """ref: stdlib/udfs/string.py:80."""
    return _strip(ctx, call, args, "right")


@register("StringReplace")
def string_replace(ctx, call, args):
    """ref: stdlib/udfs/string.py:99 — literal replace."""
    s = arg(ctx, call, args, "s")
    old = arg(ctx, call, args, "old")
    new = arg(ctx, call, args, "new")
    return Value(col=F.replace(s.col, old.col, new.col), dtype="str")


@register("SubstrCount")
def substr_count(ctx, call, args):
    """Non-overlapping substring occurrence count — Python
    ``s.count(substr)`` semantics (ref:
    example_plugins/src/udfs/string.py:130). JVM-side length
    arithmetic: ``(len(s) - len(replace(s, substr, ''))) /
    len(substr)`` — replace consumes non-overlapping matches left to
    right, exactly str.count's scan. Empty substr returns
    ``len(s) + 1`` (CPython's contract)."""
    s = arg(ctx, call, args, "s")
    sub = arg(ctx, call, args, "substr")
    n = (
        (F.length(s.col) - F.length(F.replace(s.col, sub.col, F.lit(""))))
        / F.length(sub.col)
    ).cast("long")
    return Value(
        col=F.when(F.length(sub.col) == 0, F.length(s.col) + F.lit(1)).otherwise(n),
        dtype="int",
    )


@register("StringJoin")
def string_join(ctx, call, args):
    """ref: stdlib/udfs/string.py:110."""
    strings = arg(ctx, call, args, "strings")
    sep = args.get("sep") or args.get("separator")
    sep_c = sep.col if sep is not None else F.lit("")
    if sep is not None and not sep.is_const:
        raise ctx.error("StringJoin sep= must be a constant", call.span)
    return Value(col=F.array_join(strings.col, sep.const if sep is not None else ""), dtype="str")


@register("StringSplit")
def string_split(ctx, call, args):
    """ref: stdlib/udfs/string.py:122 — literal separator split."""
    s = arg(ctx, call, args, "s")
    sep = const_arg(ctx, call, args, "sep", required=False)
    if sep is None:
        sep = const_arg(ctx, call, args, "separator", required=False, default=" ")
    return Value(col=F.split(s.col, re.escape(sep)), dtype="list:str")


@register("StringContains", query=True)
def string_contains(ctx, call, args):
    """Plugin UDF (ref: example_plugins/src/udfs/string.py:52)."""
    s = arg(ctx, call, args, "s")
    phrase = arg(ctx, call, args, "phrase")
    case_sensitive = const_arg(ctx, call, args, "case_sensitive", required=False, default=False)
    if case_sensitive:
        return Value(col=s.col.contains(phrase.col), dtype="bool")
    return Value(col=F.lower(s.col).contains(F.lower(phrase.col)), dtype="bool")


@register("ForceString")
def force_string(ctx, call, args):
    """Plugin UDF (ref: example_plugins/src/udfs/string.py:73)."""
    return Value(col=arg(ctx, call, args, "s").col.cast("string"), dtype="str")


# --- hashes / base64 (ref: stdlib/udfs/string_hashes.py, string_base64.py) --


@register("HashMd5")
def hash_md5(ctx, call, args):
    """ref: stdlib/udfs/string_hashes.py:12."""
    return Value(col=F.md5(arg(ctx, call, args, "s").col.cast("binary")), dtype="str")


@register("HashSha1")
def hash_sha1(ctx, call, args):
    """ref: stdlib/udfs/string_hashes.py:21."""
    return Value(col=F.sha1(arg(ctx, call, args, "s").col.cast("binary")), dtype="str")


@register("HashSha256")
def hash_sha256(ctx, call, args):
    """ref: stdlib/udfs/string_hashes.py:30."""
    return Value(col=F.sha2(arg(ctx, call, args, "s").col.cast("binary"), 256), dtype="str")


@register("HashSha512")
def hash_sha512(ctx, call, args):
    """ref: stdlib/udfs/string_hashes.py:39."""
    return Value(col=F.sha2(arg(ctx, call, args, "s").col.cast("binary"), 512), dtype="str")


@register("Base64Encode")
def base64_encode(ctx, call, args):
    """ref: stdlib/udfs/string_base64.py:11."""
    return Value(col=F.base64(arg(ctx, call, args, "s").col.cast("binary")), dtype="str")


@register("Base64Decode")
def base64_decode(ctx, call, args):
    """ref: stdlib/udfs/string_base64.py:20."""
    return Value(col=F.unbase64(arg(ctx, call, args, "s").col).cast("string"), dtype="str")


# --- regex (ref: stdlib/udfs/regex_match.py) -------------------------------


@register("RegexMatch", query=True)
def regex_match(ctx, call, args):
    """Search semantics, pattern pre-validated at compile time
    (ref: stdlib/udfs/regex_match.py:34-41; query variant
    engine/query_language/udfs/regex_match.py:17)."""
    target = arg(ctx, call, args, "target")
    pattern = const_arg(ctx, call, args, "pattern")
    try:
        re.compile(pattern)
    except re.error as e:
        raise ctx.error(f"invalid regex {pattern!r}: {e}", call.span)
    return Value(col=target.col.rlike(pattern), dtype="bool")


@register("Regex", query=True)
def regex_plugin(ctx, call, args):
    """Plugin query UDF (ref: example_plugins/src/udfs/query_udfs/
    regex.py:20-54)."""
    target = args.get("target") or args.get("feature")
    if target is None:
        raise ctx.error("Regex requires target=", call.span)
    pattern = const_arg(ctx, call, args, "pattern", required=False) or const_arg(
        ctx, call, args, "regex", required=False
    )
    if pattern is None:
        raise ctx.error("Regex requires pattern=", call.span)
    return Value(col=target.col.rlike(pattern), dtype="bool")


@register("RegexMatchMap")
def regex_match_map(ctx, call, args):
    """OR over patterns (ref: stdlib/udfs/regex_match.py:51-68)."""
    target = arg(ctx, call, args, "target")
    patterns = const_str_list_helper(ctx, call, "patterns", args)
    col = F.lit(False)
    for p in patterns:
        re.compile(p)
        col = col | target.col.rlike(p)
    return Value(col=col, dtype="bool")


def const_str_list_helper(ctx, call, name, args=None):
    from .registry import const_str_list

    return const_str_list(ctx, call, name, args=args)


# --- domains / emails / urls ------------------------------------------------

_URL_RE = r"https?://[\w\-\.]+(?::\d+)?(?:/[^\s\"'<>]*)?"
_DOMAIN_FROM_URL_RE = r"https?://([\w\-\.]+)"


@register("StringExtractURLs")
def string_extract_urls(ctx, call, args):
    """ref: stdlib/udfs/string.py:380."""
    s = arg(ctx, call, args, "s")
    return Value(col=F.regexp_extract_all(s.col, F.lit(f"({_URL_RE})"), 1), dtype="list:str")


@register("StringExtractDomains")
def string_extract_domains(ctx, call, args):
    """ref: stdlib/udfs/string.py:357 — registrable domains of URLs in
    free text (lowercased, deduped, order-preserving)."""
    s = arg(ctx, call, args, "s")
    doms = F.regexp_extract_all(F.lower(s.col), F.lit(_DOMAIN_FROM_URL_RE), 1)
    return Value(col=F.array_distinct(doms), dtype="list:str")


@register("ExtractDomains", query=True)
def extract_domains(ctx, call, args):
    """Plugin alias (ref: example_plugins/src/udfs/string.py:106)."""
    return string_extract_domains(ctx, call, args)


@register("ExtractListDomains")
def extract_list_domains(ctx, call, args):
    """Domains of each URL in a list
    (ref: example_plugins/src/udfs/string.py:111)."""
    lst = arg(ctx, call, args, "list")
    col = F.array_distinct(
        F.filter(
            F.transform(lst.col, lambda u: F.regexp_extract(F.lower(u), _DOMAIN_FROM_URL_RE, 1)),
            lambda d: d != "",
        )
    )
    return Value(col=col, dtype="list:str")


@register("EmailDomain")
def email_domain(ctx, call, args):
    """ref: stdlib/udfs/email_domain.py:14."""
    email = arg(ctx, call, args, "email")
    return Value(col=F.lower(F.substring_index(email.col, "@", -1)), dtype="str")


@register("EmailLocalPart")
def email_local_part(ctx, call, args):
    """ref: stdlib/udfs/email_local_part.py:11."""
    email = arg(ctx, call, args, "email")
    return Value(col=F.substring_index(email.col, "@", 1), dtype="str")


@register("EmailSubdomain")
def email_subdomain(ctx, call, args):
    """Subdomain part of the email's domain
    (ref: stdlib/udfs/email_domain.py:38)."""
    email = arg(ctx, call, args, "email")
    dom = F.lower(F.substring_index(email.col, "@", -1))
    parts = F.split(dom, r"\.")
    sub = F.when(
        F.size(parts) > 2, F.array_join(F.slice(parts, 1, F.size(parts) - 2), ".")
    ).otherwise(F.lit(""))
    return Value(col=sub, dtype="str")


@register("RootDomain")
def root_domain(ctx, call, args):
    """Last two labels (ref: example_plugins/src/udfs/domain.py:10)."""
    domain = arg(ctx, call, args, "domain")
    return Value(col=F.substring_index(F.lower(domain.col), ".", -2), dtype="str")


# common multi-label public suffixes (curated subset of the public
# Mozilla PSL — full-list deployments should swap in the real file)
_TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "com.ar", "com.tw", "com.hk", "co.in", "net.in", "org.in",
    "co.nz", "net.nz", "org.nz", "com.sg", "co.za", "com.tr",
    "com.sa", "com.eg", "co.id", "com.my", "com.ph", "com.vn",
    "co.th", "com.pk", "com.bd", "com.ng", "co.ke", "com.co",
    "com.pe", "com.ve", "com.uy", "com.ec", "com.do", "com.gt",
]


@register("DomainTld")
def domain_tld(ctx, call, args):
    """Public-suffix TLD (ref: stdlib/udfs/domain_tld.py:14 via the
    publicsuffix list): multi-label suffixes like co.uk resolve from a
    curated PSL subset (JVM isin — no Python), otherwise the last
    label."""
    domain = arg(ctx, call, args, "domain")
    low = F.lower(domain.col)
    last2 = F.substring_index(low, ".", -2)
    return Value(
        col=F.when(last2.isin(_TWO_LEVEL_SUFFIXES), last2).otherwise(
            F.substring_index(low, ".", -1)
        ),
        dtype="str",
    )


@register("DomainChopper")
def domain_chopper(ctx, call, args):
    """Suffix chain of a domain: a.b.c → [a.b.c, b.c, c]
    (ref: stdlib/udfs/domain_chopper.py:15). Pure array expression —
    no Python in the hot path."""
    domain = arg(ctx, call, args, "domain")
    parts = F.split(F.lower(domain.col), r"\.")
    n = F.size(parts)
    col = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )
    return Value(col=col, dtype="list:str")


def _ip6_udf(prefix6: int):
    import ipaddress

    def fn(s: pd.Series) -> pd.Series:
        def net(x):
            if x is None:
                return None
            try:
                return str(ipaddress.ip_network(f"{x}/{prefix6}", strict=False))
            except ValueError:
                return None

        return s.map(net)

    return F.pandas_udf(fn, T.StringType())


@register("IpNetwork")
def ip_network(ctx, call, args):
    """CIDR network of an IP address (ref: stdlib/udfs/ip_network.py:13).

    IPv4 is bit arithmetic on the dotted quad — built-in expressions
    only, the hot path. IPv6 rows (detected by ':') route to an
    Arrow-vectorized stdlib-``ipaddress`` UDF with ``prefix6``
    (default 64, the conventional end-site boundary).
    """
    ip = arg(ctx, call, args, "ip")
    prefix = const_arg(ctx, call, args, "prefix", required=False, default=24)
    prefix6 = const_arg(ctx, call, args, "prefix6", required=False, default=64)
    parts = F.split(ip.col, r"\.")
    as_int = (
        parts[0].cast("long") * F.lit(16777216)
        + parts[1].cast("long") * F.lit(65536)
        + parts[2].cast("long") * F.lit(256)
        + parts[3].cast("long")
    )
    mask = (0xFFFFFFFF << (32 - int(prefix))) & 0xFFFFFFFF
    net = as_int.bitwiseAND(F.lit(mask))
    dotted = F.concat_ws(
        ".",
        (net / F.lit(16777216)).cast("long").cast("string"),
        F.pmod((net / F.lit(65536)).cast("long"), F.lit(256)).cast("string"),
        F.pmod((net / F.lit(256)).cast("long"), F.lit(256)).cast("string"),
        F.pmod(net, F.lit(256)).cast("string"),
    )
    v4 = F.concat(dotted, F.lit(f"/{prefix}"))
    return Value(
        col=F.when(ip.col.contains(":"), _ip6_udf(int(prefix6))(ip.col)).otherwise(v4),
        dtype="str",
    )


@register("ExtractCookie")
def extract_cookie(ctx, call, args):
    """ref: stdlib/udfs/extract_cookie.py:16."""
    cookies = args.get("cookies") or args.get("cookie_str") or args.get("s")
    if cookies is None:
        raise ctx.error("ExtractCookie requires cookies=", call.span)
    name = const_arg(ctx, call, args, "name")
    pat = rf"(?:^|;\s*){re.escape(name)}=([^;]*)"
    return Value(col=F.regexp_extract(cookies.col, pat, 1), dtype="str")


@register("PhoneCountry")
def phone_country(ctx, call, args):
    """ref: stdlib/udfs/phone_country.py:13 (phonenumbers lib
    unavailable → country calling-code prefix table, major codes)."""
    phone = arg(ctx, call, args, "phone")
    return Value(col=_phone_cc_udf(phone.col), dtype="str")


@register("PhonePrefix")
def phone_prefix(ctx, call, args):
    """ref: stdlib/udfs/phone_prefix.py:11."""
    phone = arg(ctx, call, args, "phone")
    digits = F.regexp_replace(phone.col, r"[^0-9]", "")
    return Value(col=F.substring(digits, 1, 3), dtype="str")


# ITU E.164 country calling codes (public assignment list; longest
# match wins; shared codes use the largest member: 1 -> US, 7 -> RU)
_CC = {
    "1": "US", "7": "RU",
    "20": "EG", "27": "ZA", "30": "GR", "31": "NL", "32": "BE", "33": "FR",
    "34": "ES", "36": "HU", "39": "IT", "40": "RO", "41": "CH", "43": "AT",
    "44": "GB", "45": "DK", "46": "SE", "47": "NO", "48": "PL", "49": "DE",
    "51": "PE", "52": "MX", "53": "CU", "54": "AR", "55": "BR", "56": "CL",
    "57": "CO", "58": "VE", "60": "MY", "61": "AU", "62": "ID", "63": "PH",
    "64": "NZ", "65": "SG", "66": "TH", "81": "JP", "82": "KR", "84": "VN",
    "86": "CN", "90": "TR", "91": "IN", "92": "PK", "93": "AF", "94": "LK",
    "95": "MM", "98": "IR",
    "211": "SS", "212": "MA", "213": "DZ", "216": "TN", "218": "LY",
    "220": "GM", "221": "SN", "222": "MR", "223": "ML", "224": "GN",
    "225": "CI", "226": "BF", "227": "NE", "228": "TG", "229": "BJ",
    "230": "MU", "231": "LR", "232": "SL", "233": "GH", "234": "NG",
    "235": "TD", "236": "CF", "237": "CM", "238": "CV", "239": "ST",
    "240": "GQ", "241": "GA", "242": "CG", "243": "CD", "244": "AO",
    "245": "GW", "246": "IO", "248": "SC", "249": "SD", "250": "RW",
    "251": "ET", "252": "SO", "253": "DJ", "254": "KE", "255": "TZ",
    "256": "UG", "257": "BI", "258": "MZ", "260": "ZM", "261": "MG",
    "262": "RE", "263": "ZW", "264": "NA", "265": "MW", "266": "LS",
    "267": "BW", "268": "SZ", "269": "KM", "290": "SH", "291": "ER",
    "297": "AW", "298": "FO", "299": "GL",
    "350": "GI", "351": "PT", "352": "LU", "353": "IE", "354": "IS",
    "355": "AL", "356": "MT", "357": "CY", "358": "FI", "359": "BG",
    "370": "LT", "371": "LV", "372": "EE", "373": "MD", "374": "AM",
    "375": "BY", "376": "AD", "377": "MC", "378": "SM", "380": "UA",
    "381": "RS", "382": "ME", "383": "XK", "385": "HR", "386": "SI",
    "387": "BA", "389": "MK",
    "420": "CZ", "421": "SK", "423": "LI",
    "500": "FK", "501": "BZ", "502": "GT", "503": "SV", "504": "HN",
    "505": "NI", "506": "CR", "507": "PA", "508": "PM", "509": "HT",
    "590": "GP", "591": "BO", "592": "GY", "593": "EC", "594": "GF",
    "595": "PY", "596": "MQ", "597": "SR", "598": "UY", "599": "CW",
    "670": "TL", "672": "NF", "673": "BN", "674": "NR", "675": "PG",
    "676": "TO", "677": "SB", "678": "VU", "679": "FJ", "680": "PW",
    "681": "WF", "682": "CK", "683": "NU", "685": "WS", "686": "KI",
    "687": "NC", "688": "TV", "689": "PF", "690": "TK", "691": "FM",
    "692": "MH",
    "850": "KP", "852": "HK", "853": "MO", "855": "KH", "856": "LA",
    "880": "BD", "886": "TW",
    "960": "MV", "961": "LB", "962": "JO", "963": "SY", "964": "IQ",
    "965": "KW", "966": "SA", "967": "YE", "968": "OM", "970": "PS",
    "971": "AE", "972": "IL", "973": "BH", "974": "QA", "975": "BT",
    "976": "MN", "977": "NP", "992": "TJ", "993": "TM", "994": "AZ",
    "995": "GE", "996": "KG", "998": "UZ",
}


@F.pandas_udf(T.StringType())
def _phone_cc_udf(phone: pd.Series) -> pd.Series:
    def cc(p):
        if p is None:
            return None
        digits = re.sub(r"[^0-9+]", "", str(p))
        if not digits.startswith("+"):
            return None
        digits = digits[1:]
        for ln in (3, 2, 1):
            if digits[:ln] in _CC:
                return _CC[digits[:ln]]
        return None

    return phone.map(cc)
