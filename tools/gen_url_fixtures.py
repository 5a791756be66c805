#!/usr/bin/env python3
"""Generate URL-algebra truth tables by executing the reference's own
functions (/root/reference/utils.py, /root/reference/newspaperlite/newsurl.py)
against a battery of URLs, writing TSV fixtures consumed by UrlOpsSpec.

The reference imports re2/tldextract/validators which are absent here;
re2 is shimmed with stdlib re (identical semantics for the patterns used),
tldextract/validators with small equivalents documented in PyUrl.scala /
UrlOps.scala. Everything else (urllib.parse, string ops) is genuine stdlib,
so the intricate parts (unquote, urlparse, clean_url control flow) are the
real reference behavior.
"""
import sys, types, re as _re, os

# ---- shims ----------------------------------------------------------------
sys.modules['re2'] = _re

tldmod = types.ModuleType('tldextract')
TWO_LABEL = {
    "co.uk","org.uk","gov.uk","ac.uk","me.uk","net.uk",
    "com.au","net.au","org.au","gov.au","edu.au",
    "co.jp","ne.jp","or.jp","ac.jp","go.jp",
    "com.br","net.br","org.br","gov.br",
    "co.in","net.in","org.in","gen.in","firm.in",
    "com.cn","net.cn","org.cn","gov.cn",
    "com.mx","com.ar","com.tr","com.sg","com.hk","com.tw",
    "co.za","co.nz","co.kr","co.il","co.id","co.th",
    "gov.it","edu.it"}
class _Tld:
    def __init__(self, sub, dom, suf):
        self.subdomain, self.domain, self.suffix = sub, dom, suf
def _extract(url):
    from urllib.parse import urlparse
    u = url if (url and '//' in url) else 'http://' + (url or '')
    host = urlparse(u).hostname or ''
    labels = host.split('.')
    if len(labels) <= 1:
        return _Tld('', host, '')
    last_two = '.'.join(labels[-2:])
    sl = 2 if (len(labels) >= 3 and last_two in TWO_LABEL) else 1
    return _Tld('.'.join(labels[:-(sl+1)]), labels[-(sl+1)], '.'.join(labels[-sl:]))
tldmod.extract = _extract
sys.modules['tldextract'] = tldmod

valmod = types.ModuleType('validators')
_VALID = _re.compile(
    r'^(https?|ftp)://'
    r'(\S+(:\S*)?@)?'
    r'((\d{1,3}\.){3}\d{1,3}'
    r'|([a-zA-Z0-9\u00a1-\uffff](-?[a-zA-Z0-9\u00a1-\uffff])*)'
    r'(\.[a-zA-Z0-9\u00a1-\uffff](-?[a-zA-Z0-9\u00a1-\uffff])*)*'
    r'\.[a-zA-Z\u00a1-\uffff]{2,})'
    r'(:\d{2,5})?'
    r'(/[^\s]*)?$', _re.I)
def _vurl(url, public=False):
    m = _VALID.match(url or '')
    if not m:
        return False
    from urllib.parse import urlparse
    h = urlparse(url).hostname
    if h and _re.fullmatch(r'(\d{1,3}\.){3}\d{1,3}', h):
        parts = [int(x) for x in h.split('.')]
        if any(p > 255 for p in parts):
            return False
        a, b = parts[0], parts[1]
        if a in (10, 127, 0) or (a == 172 and 16 <= b <= 31) \
           or (a == 192 and b == 168) or (a == 169 and b == 254):
            return False
    return True
valmod.url = _vurl
sys.modules['validators'] = valmod

for m in ('langdetect', 'textblob'):
    mod = types.ModuleType(m)
    mod.detect = lambda t: 'it'
    mod.TextBlob = object
    sys.modules[m] = mod
dparse = types.ModuleType('dateutil.parser')
import dateutil.parser as real_dparser
sys.modules['dateutil.parser'] = real_dparser

sys.path.insert(0, '/root/reference')
sys.path.insert(0, '/root/reference/newspaperlite')
import utils                                    # noqa: E402
import importlib.util
spec = importlib.util.spec_from_file_location(
    'newsurl', '/root/reference/newspaperlite/newsurl.py')
newsurl = importlib.util.module_from_spec(spec)
spec.loader.exec_module(newsurl)

# ---- battery ----------------------------------------------------------------
URLS = [
    "https://www.example.it/cronaca/2021/03/15/titolo-articolo-lungo-qui.html",
    "https://example.it/cronaca/2021/03/15/titolo-articolo-lungo-qui.html",
    "http://www.foo.com/news/story.html?utm_source=x&share=1",
    "http://www.foo.com/a%20b/c%2Fd.html",
    "http://foo.com/path/?q=https://foo.com/embedded",
    "http://foo.com/path?next=http://foo.com/target&x=1",
    "http://foo.com/redirect?url=http%3A%2F%2Ffoo.com%2Fdeep",
    "https://news.site.it/article/this-is-a-long-news-slug-title",
    "https://news.site.it/t/short",
    "https://site.it/contact/us.html",
    "https://site.it/about",
    "https://careers.site.it/jobs/opening-one.html",
    "https://site.it/2020/12/01/fine-anno.htm",
    "https://site.it/video/v/12345.html",
    "https://site.it/gallery/foto_di_roma_al_tramonto_oggi",
    "https://site.it/a_b_c_d_e_f",
    "https://site.it/site-one-two-three-four-five",
    "https://shop.example.com/story/x/y.html",
    "https://www.amazon.com/news/2020/01/01/item.html",
    "http://foo.com/mailto",
    "https://mailto.foo.com/x",
    "http://foo.com/file.pdf",
    "http://foo.com/file.php",
    "http://foo.com/file.phtml",
    "http://foo.com/dir/file.verylong",
    "http://foo.com/dir.name/file",
    "http://foo.com/",
    "http://foo.com",
    "https://foo.com/index.html/",
    "https://foo.com/a/index/b/story",
    "https://sub.domain.co.uk/news/article/one-two.html",
    "http://192.168.1.1/x.html",
    "http://10.0.0.1/y.html",
    "http://8.8.8.8/z.html",
    "not a url",
    "ftp://files.example.com/pub/file.html",
    "https://example.com/a b/c.html",
    "https://example.com/%e2%82%ac/euro.html",
    "https://example.com/%zz/bad-escape.html",
    "https://EXAMPLE.com/Path/UPPER.HTML",
    "https://example.com/search?email=x@y.z",
    "https://example.com/x?Email=abc",
    "https://example.com/x?mail=abc",
    "https://example.com/x?remail=abc",
    "https://site.it/news.php?id=7",
    "https://site.it/css/style.css",
    "https://site.it/meteo/oggi.html",
    "https://site.it/forum/thread/123.html",
    "https://site.it/one/two/three",
    "https://site.it/squalo-bianco-avvistato-al-largo-della-sardegna",
    "https://site.it/sezione/squalo-bianco-avvistato-al-largo-della-sardegna",
    "https://site.it/site-it-squalo-bianco-avvistato-oggi",
    "http://www2.corriere.it/cronache/2019_marzo_03/articolo-xyz.shtml",
    "https://www.repubblica.it/esteri/2020/05/06/news/titolo_con_underscore_molto_lungo-256123/",
    "http://foo.it/a;b/c.html",
    "http://foo.it/a{b}/c.html",
    "http://foo.it/x=1/page.html",
    "https://foo.it/tag/articolo.html#frag",
    "",
]

DOMAINS = ["foo.com", "site.it", "example.it", "corriere.it"]

def esc(s):
    if s is None:
        return "\\N"
    if s is True:
        return "true"
    if s is False:
        return "false"
    return str(s).replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

outdir = '/root/repo/src/test/resources/fixtures'
os.makedirs(outdir, exist_ok=True)

rows = []
for u in URLS:
    try: cu = utils.clean_url(u)
    except Exception: cu = None
    try: cu_keep = utils.clean_url(u, False)
    except Exception: cu_keep = None
    try: scheme, key = utils.split_url_and_scheme(u)
    except Exception: scheme, key = None, None
    try: pd = utils.get_principal_domain(u)
    except Exception: pd = None
    try: ft = utils.get_filetype_from_url(u)
    except Exception: ft = None
    try: vu = utils.is_valid_url(u)
    except Exception: vu = None
    try: nav = utils.is_valid_url_to_navigate(u)
    except Exception: nav = None
    try: news = newsurl.is_news_url(u)
    except Exception: news = None
    rows.append("\t".join(esc(x) for x in
        [u, cu, cu_keep, scheme, key, pd, ft, vu, nav, news]))
with open(f'{outdir}/url_truth.tsv', 'w') as f:
    f.write("url\tclean\tclean_keepargs\tscheme\tkey\tprincipal_domain\tfiletype\tis_valid\tis_navigable\tis_news\n")
    f.write("\n".join(rows) + "\n")

rows = []
for u in URLS:
    for d in DOMAINS:
        try: cud = utils.clean_url(u, True, d)
        except Exception: cud = None
        try: dl = utils.is_domain_link(u, d)
        except Exception: dl = None
        rows.append("\t".join(esc(x) for x in [u, d, cud, dl]))
with open(f'{outdir}/url_domain_truth.tsv', 'w') as f:
    f.write("url\tdomain\tclean_with_domain\tis_domain_link\n")
    f.write("\n".join(rows) + "\n")

rows = []
PAIRS = [(a, b) for a in URLS[:20] for b in URLS[:20]]
for a, b in PAIRS:
    try: eq = utils.are_equals_urls(a, b)
    except Exception: eq = None
    rows.append("\t".join(esc(x) for x in [a, b, eq]))
with open(f'{outdir}/url_equals_truth.tsv', 'w') as f:
    f.write("url1\turl2\tequal\n")
    f.write("\n".join(rows) + "\n")

print("wrote fixtures to", outdir)
