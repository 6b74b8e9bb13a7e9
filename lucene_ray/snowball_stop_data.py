"""GENERATED from the reference snowball stop lists
(analysis/common/src/resources/org/apache/lucene/analysis/snowball/
*_stop.txt) by the WordlistLoader.getSnowballWordSet parse rule
(strip | comments, whitespace-split).  tests/test_snowball.py
re-extracts and compares."""

DANISH_STOP = frozenset(
    ("og i jeg det at en den til er som på de med han af for ikke "
    "der var mig sig men et har om vi min havde ham hun nu over "
    "da fra du ud sin dem os op man hans hvor eller hvad skal "
    "selv her alle vil blev kunne ind når være dog noget ville jo "
    "deres efter ned skulle denne end dette mit også under have "
    "dig anden hende mine alt meget sit sine vor mod disse hvis "
    "din nogle hos blive mange ad bliver hendes været thi jer "
    "sådan ").split())

DUTCH_STOP = frozenset(
    ("de en van ik te dat die in een hij het niet zijn is was op "
    "aan met als voor had er maar om hem dan zou of wat mijn men "
    "dit zo door over ze zich bij ook tot je mij uit der daar "
    "haar naar heb hoe heeft hebben deze u want nog zal me zij nu "
    "ge geen omdat iets worden toch al waren veel meer doen toen "
    "moet ben zonder kan hun dus alles onder ja eens hier wie "
    "werd altijd doch wordt wezen kunnen ons zelf tegen na reeds "
    "wil kon niets uw iemand geweest andere ").split())

NORWEGIAN_STOP = frozenset(
    ("og i jeg det at en et den til er som på de med han av ikke "
    "ikkje der så var meg seg men ett har om vi min mitt ha hadde "
    "hun nå over da ved fra du ut sin dem oss opp man kan hans "
    "hvor eller hva skal selv sjøl her alle vil bli ble blei "
    "blitt kunne inn når være kom noen noe ville dere deres kun "
    "ja etter ned skulle denne for deg si sine sitt mot å meget "
    "hvorfor dette disse uten hvordan ingen din ditt blir samme "
    "hvilken hvilke sånn inni mellom vår hver hvem vors hvis både "
    "bare enn fordi før mange også slik vært båe begge siden dykk "
    "dykkar dei deira deires deim di då eg ein eit eitt elles "
    "honom hjå ho hoe henne hennar hennes hoss hossen ingi inkje "
    "korleis korso kva kvar kvarhelst kven kvi kvifor me medan mi "
    "mine mykje no nokon noka nokor noko nokre sia sidan so somt "
    "somme um upp vere vore verte vort varte vart ").split())

RUSSIAN_STOP = frozenset(
    ("и в во не что он на я с со как а то все она так его но да "
    "ты к у же вы за бы по только ее мне было вот от меня еще нет "
    "о из ему теперь когда даже ну вдруг ли если уже или ни быть "
    "был него до вас нибудь опять уж вам сказал ведь там потом "
    "себя ничего ей может они тут где есть надо ней для мы тебя "
    "их чем была сам чтоб без будто человек чего раз тоже себе "
    "под жизнь будет ж тогда кто этот говорил того потому этого "
    "какой совсем ним здесь этом один почти мой тем чтобы нее "
    "кажется сейчас были куда зачем сказать всех никогда сегодня "
    "можно при наконец два об другой хоть после над больше тот "
    "через эти нас про всего них какая много разве сказала три "
    "эту моя впрочем хорошо свою этой перед иногда лучше чуть том "
    "нельзя такой им более всегда конечно всю между ").split())

SWEDISH_STOP = frozenset(
    ("och det att i en jag hon som han på den med var sig för så "
    "till är men ett om hade de av icke mig du henne då sin nu "
    "har inte hans honom skulle hennes där min man ej vid kunde "
    "något från ut när efter upp vi dem vara vad över än dig kan "
    "sina här ha mot alla under någon eller allt mycket sedan ju "
    "denna själv detta åt utan varit hur ingen mitt ni bli blev "
    "oss din dessa några deras blir mina samma vilken er sådan "
    "vår blivit dess inom mellan sådant varför varje vilka ditt "
    "vem vilket sitt sådana vart dina vars vårt våra ert era "
    "vilkas ").split())
