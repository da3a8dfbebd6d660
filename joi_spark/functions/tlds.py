"""Bundled IANA top-level-domain snapshot for ``tlds=True``.

Provenance: point-in-time ASCII snapshot of the public IANA root zone
database (https://www.iana.org/domains/root/db — the same public data
the reference's address library generates its table from).  Coverage:
all ISO 3166-1 ccTLDs, the legacy/sponsored gTLDs, and the widely-used
new gTLDs.  Documented divergence: internationalized (``xn--``) TLDs
and long-tail brand gTLDs are not enumerated here — domains under them
fail ``tlds=True`` validation; pass an explicit ``tlds={'allow': [...]}``
to widen.  The snapshot is a frozenset so rule compilation can embed it
directly into an ``isin`` predicate / Python set probe.
"""

from __future__ import annotations

_CCTLDS = """
ac ad ae af ag ai al am ao aq ar as at au aw ax az ba bb bd be bf bg bh
bi bj bm bn bo br bs bt bw by bz ca cc cd cf cg ch ci ck cl cm cn co cr
cu cv cw cx cy cz de dj dk dm do dz ec ee eg er es et eu fi fj fk fm fo
fr ga gd ge gf gg gh gi gl gm gn gp gq gr gs gt gu gw gy hk hm hn hr ht
hu id ie il im in io iq ir is it je jm jo jp ke kg kh ki km kn kp kr kw
ky kz la lb lc li lk lr ls lt lu lv ly ma mc md me mg mh mk ml mm mn mo
mp mq mr ms mt mu mv mw mx my mz na nc ne nf ng ni nl no np nr nu nz om
pa pe pf pg ph pk pl pm pn pr ps pt pw py qa re ro rs ru rw sa sb sc sd
se sg sh si sk sl sm sn so sr ss st su sv sx sy sz tc td tf tg th tj tk
tl tm tn to tr tt tv tw tz ua ug uk us uy uz va vc ve vg vi vn vu wf ws
ye yt za zm zw
"""

_LEGACY_GTLDS = """
com org net edu gov mil int arpa
aero asia biz cat coop info jobs mobi museum name post pro tel travel xxx
"""

_NEW_GTLDS = """
academy accountant accountants agency airforce apartments app army art
attorney auction audio auto autos baby band bar bargains beauty beer
best bid bike bingo bio black blog blue boats bot boutique build
builders business buzz cab cafe camera camp capital car cards care
careers cars casa cash casino catering center ceo chat cheap christmas
church city claims cleaning click clinic clothing cloud club coach
codes coffee college community company computer condos construction
consulting contact contractors cooking cool country coupons courses
credit creditcard cricket cruises dance data dating day deals degree
delivery democrat dental dentist design dev diamonds diet digital
direct directory discount doctor dog domains download earth eco
education email energy engineer engineering enterprises equipment
estate events exchange expert exposed express fail faith family fan
fans farm fashion film finance financial fish fishing fit fitness
flights florist flowers football forsale foundation fun fund furniture
futbol fyi gallery game games garden gifts gives glass global gold golf
graphics gratis green gripe group guide guitars guru haus health
healthcare help hiphop hockey holdings holiday homes horse hospital
host hosting house how icu immo inc industries institute insurance
insure international investments irish jewelry juegos kitchen land
lawyer lease legal life lighting limited limo link live loan loans lol
love ltd luxury maison management market marketing markets mba media
memorial men menu moda moe money mortgage movie music navy network new
news ninja now nyc observer office one online ooo organic page paris
partners parts party pet pets phone photo photography photos pics
pictures pizza place plumbing plus poker porn press productions promo
properties property pub racing radio recipes red rehab reise reisen
rent rentals repair report republican rest restaurant review reviews
rich rip rocks rodeo run sale salon sarl school schule science security
services sex sexy shoes shop shopping show singles site ski soccer
social software solar solutions space sport store stream studio study
style supplies supply support surf surgery systems tax taxi team tech
technology tennis theater tickets tips tires today tools top tours
town toys trade trading training tube university uno vacations ventures
vet viajes video villas vin vip vision vodka vote voting voyage watch
webcam website wedding wiki win wine work works world wtf xyz yoga zone
"""

TLDS: frozenset[str] = frozenset(
    (_CCTLDS + _LEGACY_GTLDS + _NEW_GTLDS).split())
