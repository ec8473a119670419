#!/usr/bin/env python3
"""One-shot builder for the round-18 pos_gold.tsv extension.

Same contract as tools/pos_gold_extend.py (the r16 extension): SENTENCES
below are builder-authored held-out prose annotated word_TAG per token
(Petrov universal tagset, the repo's closed-class conventions — 'to' is
always PRT, possessive pronouns are PRON, 'up/out/off/down/away/back'
are PRT, 'before/after' are ADP, 'that/all/no/such' are DET). The
validator enforces the closed-class conventions, pure punctuation = '.',
digit tokens = NUM; open-class annotations were written as natural text
first and tagged second, never against the tagger's output. Disjoint
from fixtures/pos_train.tsv.

Usage: python3 tools/pos_gold_extend_r18.py >> fixtures/pos_gold.tsv
"""
import re, sys

LEXICON = {}
for tag, words in {
    "DET": "the a an this that these those each every some any no all both either neither another such",
    "PRON": "i you he she it we they me him her us them my your his its our their mine yours hers ours theirs myself yourself himself herself itself ourselves themselves who whom whose which what something anything nothing everything someone anyone everyone",
    "ADP": "of in for with on at by from about into over under between through during against among within without before after above below near behind beside",
    "CONJ": "and or but nor so yet because although while if when than as until unless since whether though",
    "VERB": "is are was were be been being am do does did doing have has had having will would can could shall should may might must get got gets make made makes go went gone goes see saw seen says said know knew think thought take took come came want wanted give gave feel felt seem seemed look looked",
    "ADV": "not very really too also just never always often sometimes quite rather almost already still again perhaps maybe however then there here now even only more most much well",
    "PRT": "to n't 's up out off down away back",
    "NUM": "one two three four five six seven eight nine ten zero hundred thousand million billion first second third",
}.items():
    for w in words.split():
        LEXICON[w] = tag

SENTENCES = """
The_DET ferry_NOUN crossed_VERB the_DET strait_NOUN in_ADP forty_NUM minutes_NOUN ._.
Passengers_NOUN watched_VERB the_DET cliffs_NOUN slide_VERB past_ADP the_DET railing_NOUN ._.
A_DET steward_NOUN poured_VERB coffee_NOUN into_ADP paper_NOUN cups_NOUN ._.
The_DET harbor_NOUN master_NOUN logged_VERB every_DET arrival_NOUN by_ADP hand_NOUN ._.
Her_PRON ledger_NOUN survived_VERB the_DET fire_NOUN of_ADP 1978_NUM ._.
The_DET bakery_NOUN on_ADP Mill_NOUN Street_NOUN opens_VERB before_ADP dawn_NOUN ._.
Flour_NOUN dust_NOUN hangs_VERB in_ADP the_DET warm_ADJ air_NOUN ._.
The_DET ovens_NOUN roar_VERB while_CONJ the_DET town_NOUN sleeps_VERB ._.
Customers_NOUN line_VERB up_PRT for_ADP the_DET dark_ADJ rye_NOUN ._.
Nobody_NOUN leaves_VERB without_ADP a_DET warm_ADJ loaf_NOUN ._.
The_DET surveyors_NOUN marked_VERB the_DET boundary_NOUN with_ADP steel_NOUN pins_NOUN ._.
Their_PRON map_NOUN showed_VERB a_DET creek_NOUN that_DET no_DET longer_ADV exists_VERB ._.
The_DET judge_NOUN ordered_VERB a_DET fresh_ADJ survey_NOUN in_ADP spring_NOUN ._.
Both_DET neighbors_NOUN accepted_VERB the_DET new_ADJ line_NOUN without_ADP protest_NOUN ._.
The_DET fence_NOUN went_VERB up_PRT in_ADP a_DET single_ADJ weekend_NOUN ._.
A_DET violinist_NOUN practiced_VERB scales_NOUN beside_ADP the_DET open_ADJ window_NOUN ._.
Neighbors_NOUN complained_VERB at_ADP first_NUM ,_. then_ADV grew_VERB fond_ADJ of_ADP the_DET sound_NOUN ._.
She_PRON won_VERB a_DET seat_NOUN in_ADP the_DET city_NOUN orchestra_NOUN ._.
The_DET whole_ADJ block_NOUN attended_VERB her_PRON first_NUM concert_NOUN ._.
Flowers_NOUN arrived_VERB at_ADP her_PRON door_NOUN for_ADP a_DET week_NOUN ._.
The_DET warehouse_NOUN stores_VERB grain_NOUN from_ADP three_NUM counties_NOUN ._.
Trucks_NOUN queue_VERB along_ADP the_DET access_NOUN road_NOUN each_DET harvest_NOUN ._.
A_DET conveyor_NOUN lifts_VERB the_DET sacks_NOUN to_PRT the_DET upper_ADJ floor_NOUN ._.
Inspectors_NOUN sample_VERB every_DET tenth_ADJ load_NOUN for_ADP moisture_NOUN ._.
Wet_ADJ grain_NOUN goes_VERB back_PRT on_ADP the_DET truck_NOUN ._.
The_DET climbers_NOUN studied_VERB the_DET north_ADJ face_NOUN through_ADP binoculars_NOUN ._.
Fresh_ADJ snow_NOUN hid_VERB the_DET usual_ADJ route_NOUN ._.
They_PRON waited_VERB two_NUM days_NOUN for_ADP the_DET wind_NOUN to_PRT drop_VERB ._.
The_DET summit_NOUN came_VERB into_ADP view_NOUN at_ADP noon_NOUN ._.
Their_PRON photos_NOUN show_VERB nothing_PRON but_CONJ cloud_NOUN and_CONJ rope_NOUN ._.
The_DET pharmacist_NOUN counts_VERB pills_NOUN behind_ADP a_DET glass_NOUN screen_NOUN ._.
Regulars_NOUN trust_VERB her_PRON advice_NOUN more_ADV than_CONJ any_DET label_NOUN ._.
She_PRON spots_VERB a_DET bad_ADJ interaction_NOUN before_ADP the_DET computer_NOUN does_VERB ._.
The_DET shop_NOUN stays_VERB open_ADJ through_ADP lunch_NOUN ._.
Her_PRON assistant_NOUN studies_VERB for_ADP the_DET board_NOUN exam_NOUN at_ADP night_NOUN ._.
The_DET editor_NOUN cut_VERB the_DET opening_NOUN of_ADP my_PRON article_NOUN ._.
The_DET piece_NOUN reads_VERB faster_ADV now_ADV ,_. though_CONJ I_PRON miss_VERB the_DET old_ADJ lead_NOUN ._.
We_PRON argued_VERB about_ADP a_DET comma_NOUN for_ADP an_DET hour_NOUN ._.
The_DET print_NOUN deadline_NOUN settled_VERB the_DET question_NOUN ._.
Readers_NOUN never_ADV saw_VERB the_DET difference_NOUN ._.
A_DET beekeeper_NOUN checks_VERB the_DET hives_NOUN after_ADP every_DET storm_NOUN ._.
Smoke_NOUN calms_VERB the_DET bees_NOUN while_CONJ she_PRON lifts_VERB the_DET frames_NOUN ._.
Honey_NOUN flows_VERB slowly_ADV in_ADP the_DET cold_ADJ months_NOUN ._.
She_PRON sells_VERB jars_NOUN at_ADP the_DET Saturday_NOUN market_NOUN ._.
The_DET dark_ADJ batch_NOUN from_ADP the_DET pine_NOUN woods_NOUN sells_VERB first_NUM ._.
The_DET intern_NOUN rewrote_VERB the_DET parser_NOUN in_ADP a_DET week_NOUN ._.
Her_PRON version_NOUN handles_VERB nested_ADJ quotes_NOUN correctly_ADV ._.
The_DET old_ADJ code_NOUN failed_VERB on_ADP empty_ADJ files_NOUN ._.
Tests_NOUN now_ADV cover_VERB every_DET branch_NOUN of_ADP the_DET grammar_NOUN ._.
The_DET team_NOUN shipped_VERB the_DET release_NOUN a_DET day_NOUN early_ADV ._.
Rain_NOUN delayed_VERB the_DET final_ADJ match_NOUN until_CONJ Monday_NOUN ._.
The_DET groundskeeper_NOUN covered_VERB the_DET pitch_NOUN with_ADP tarps_NOUN ._.
Fans_NOUN huddled_VERB under_ADP the_DET north_ADJ stand_NOUN ._.
The_DET captain_NOUN signed_VERB programs_NOUN to_PRT pass_VERB the_DET time_NOUN ._.
Monday_NOUN dawned_VERB clear_ADJ and_CONJ cold_ADJ ._.
The_DET archivist_NOUN found_VERB a_DET sealed_ADJ envelope_NOUN inside_ADP a_DET ledger_NOUN ._.
The_DET letter_NOUN named_VERB a_DET ship_NOUN lost_VERB in_ADP 1871_NUM ._.
Historians_NOUN traced_VERB the_DET crew_NOUN through_ADP parish_NOUN records_NOUN ._.
Two_NUM descendants_NOUN still_ADV farm_VERB the_DET same_ADJ valley_NOUN ._.
The_DET museum_NOUN mounted_VERB the_DET letter_NOUN under_ADP glass_NOUN ._.
The_DET chef_NOUN salts_VERB the_DET water_NOUN like_ADP the_DET sea_NOUN ._.
Pasta_NOUN cooks_VERB in_ADP four_NUM minutes_NOUN ,_. no_DET more_ADV ._.
He_PRON saves_VERB a_DET cup_NOUN of_ADP the_DET starchy_ADJ water_NOUN ._.
The_DET sauce_NOUN comes_VERB together_ADV off_PRT the_DET heat_NOUN ._.
Guests_NOUN mop_VERB the_DET plates_NOUN with_ADP bread_NOUN ._.
The_DET night_NOUN shift_NOUN reported_VERB a_DET strange_ADJ reading_NOUN at_ADP the_DET dam_NOUN ._.
Engineers_NOUN drained_VERB the_DET spillway_NOUN to_PRT inspect_VERB the_DET gates_NOUN ._.
A_DET crack_NOUN ran_VERB along_ADP the_DET third_NUM pier_NOUN ._.
Crews_NOUN poured_VERB concrete_NOUN for_ADP two_NUM weeks_NOUN straight_ADV ._.
The_DET reservoir_NOUN refilled_VERB by_ADP June_NOUN ._.
My_PRON uncle_NOUN repairs_VERB clocks_NOUN in_ADP his_PRON kitchen_NOUN ._.
Gears_NOUN and_CONJ springs_NOUN cover_VERB the_DET table_NOUN ._.
He_PRON listens_VERB to_PRT a_DET movement_NOUN before_ADP he_PRON opens_VERB it_PRON ._.
A_DET healthy_ADJ clock_NOUN ,_. he_PRON says_VERB ,_. breathes_VERB evenly_ADV ._.
His_PRON own_ADJ watch_NOUN runs_VERB six_NUM minutes_NOUN fast_ADV ._.
The_DET council_NOUN debated_VERB the_DET bus_NOUN route_NOUN for_ADP months_NOUN ._.
Merchants_NOUN wanted_VERB the_DET stop_NOUN moved_VERB off_PRT the_DET square_NOUN ._.
Riders_NOUN packed_VERB the_DET hearing_NOUN and_CONJ won_VERB ._.
The_DET stop_NOUN stays_VERB ,_. with_ADP a_DET new_ADJ shelter_NOUN ._.
Ridership_NOUN rose_VERB nine_NUM percent_NOUN that_DET winter_NOUN ._.
A_DET fox_NOUN dens_VERB under_ADP the_DET old_ADJ school_NOUN ._.
Teachers_NOUN watch_VERB the_DET kits_NOUN play_VERB from_ADP the_DET staff_NOUN room_NOUN ._.
The_DET janitor_NOUN leaves_VERB the_DET east_ADJ gate_NOUN alone_ADV ._.
By_ADP autumn_NOUN the_DET family_NOUN moves_VERB to_PRT the_DET river_NOUN bank_NOUN ._.
Children_NOUN draw_VERB foxes_NOUN all_DET year_NOUN ._.
The_DET translator_NOUN kept_VERB the_DET rhythm_NOUN and_CONJ lost_VERB a_DET pun_NOUN ._.
A_DET footnote_NOUN explains_VERB the_DET joke_NOUN ,_. which_PRON kills_VERB it_PRON ._.
Her_PRON editor_NOUN wants_VERB fewer_ADJ notes_NOUN and_CONJ braver_ADJ choices_NOUN ._.
The_DET poet_NOUN ,_. reached_VERB by_ADP phone_NOUN ,_. laughed_VERB and_CONJ approved_VERB ._.
The_DET new_ADJ edition_NOUN sold_VERB out_PRT in_ADP a_DET month_NOUN ._.
Divers_NOUN mapped_VERB the_DET wreck_NOUN at_ADP thirty_NUM meters_NOUN ._.
Silt_NOUN hides_VERB the_DET stern_NOUN from_ADP the_DET cameras_NOUN ._.
A_DET brass_NOUN bell_NOUN surfaced_VERB with_ADP the_DET third_NUM team_NOUN ._.
The_DET name_NOUN on_ADP the_DET bell_NOUN matched_VERB the_DET missing_ADJ schooner_NOUN ._.
The_DET state_NOUN claimed_VERB the_DET site_NOUN a_DET week_NOUN later_ADV ._.
The_DET landlord_NOUN raised_VERB the_DET rent_NOUN again_ADV in_ADP March_NOUN ._.
Three_NUM tenants_NOUN left_VERB before_ADP summer_NOUN ._.
The_DET bookshop_NOUN on_ADP the_DET corner_NOUN held_VERB on_ADP ._.
Loyal_ADJ customers_NOUN started_VERB a_DET monthly_ADJ reading_NOUN series_NOUN ._.
The_DET owner_NOUN cries_VERB a_DET little_ADJ at_ADP every_DET full_ADJ house_NOUN ._.
Frost_NOUN killed_VERB the_DET early_ADJ blossoms_NOUN on_ADP the_DET south_ADJ slope_NOUN ._.
Growers_NOUN lit_VERB smudge_NOUN pots_NOUN through_ADP the_DET night_NOUN ._.
The_DET orchard_NOUN saved_VERB half_ADJ the_DET crop_NOUN ._.
Prices_NOUN climbed_VERB anyway_ADV at_ADP the_DET roadside_NOUN stands_NOUN ._.
City_NOUN buyers_NOUN never_ADV asked_VERB why_ADV ._.
The_DET recruit_NOUN polished_VERB boots_NOUN until_CONJ midnight_NOUN ._.
Inspection_NOUN came_VERB at_ADP six_NUM sharp_ADV ._.
The_DET sergeant_NOUN found_VERB dust_NOUN on_ADP a_DET shelf_NOUN nobody_NOUN could_VERB reach_VERB ._.
The_DET platoon_NOUN ran_VERB the_DET hill_NOUN twice_ADV before_ADP breakfast_NOUN ._.
By_ADP graduation_NOUN the_DET hill_NOUN felt_VERB short_ADJ ._.
A_DET glass_NOUN blower_NOUN shapes_VERB a_DET vase_NOUN from_ADP orange_ADJ light_NOUN ._.
The_DET furnace_NOUN roars_VERB behind_ADP her_PRON shoulder_NOUN ._.
One_NUM wrong_ADJ breath_NOUN ruins_VERB an_DET hour_NOUN of_ADP work_NOUN ._.
Finished_ADJ pieces_NOUN cool_VERB overnight_ADV in_ADP a_DET second_NUM oven_NOUN ._.
Tourists_NOUN pay_VERB well_ADV for_ADP the_DET blue_ADJ ones_NOUN ._.
The_DET auditor_NOUN flagged_VERB a_DET duplicate_ADJ invoice_NOUN in_ADP April_NOUN ._.
The_DET vendor_NOUN blamed_VERB a_DET software_NOUN migration_NOUN ._.
Refunds_NOUN arrived_VERB with_ADP a_DET quiet_ADJ apology_NOUN ._.
The_DET firm_NOUN tightened_VERB its_PRON approval_NOUN chain_NOUN ._.
Nobody_NOUN mentioned_VERB the_DET episode_NOUN at_ADP the_DET annual_ADJ meeting_NOUN ._.
Swallows_NOUN nest_VERB under_ADP the_DET train_NOUN shed_NOUN roof_NOUN ._.
Commuters_NOUN dodge_VERB the_DET morning_NOUN flights_NOUN ._.
The_DET station_NOUN posted_VERB signs_NOUN and_CONJ changed_VERB nothing_PRON ._.
A_DET retired_ADJ teacher_NOUN counts_VERB the_DET nests_NOUN each_DET spring_NOUN ._.
Her_PRON notebook_NOUN goes_VERB back_PRT twenty_NUM years_NOUN ._.
The_DET mayor_NOUN promised_VERB streetlights_NOUN for_ADP the_DET river_NOUN path_NOUN ._.
The_DET budget_NOUN slipped_VERB twice_ADV ,_. then_ADV passed_VERB ._.
Crews_NOUN planted_VERB the_DET poles_NOUN in_ADP October_NOUN ._.
Runners_NOUN now_ADV train_VERB after_ADP dark_NOUN in_ADP safety_NOUN ._.
The_DET opposition_NOUN claims_VERB credit_NOUN ,_. of_ADP course_NOUN ._.
A_DET stray_ADJ dog_NOUN adopted_VERB the_DET fire_NOUN station_NOUN ._.
The_DET crew_NOUN named_VERB him_PRON Chief_NOUN and_CONJ built_VERB a_DET bed_NOUN ._.
He_PRON rides_VERB in_ADP the_DET second_NUM truck_NOUN ,_. never_ADV the_DET first_NUM ._.
Donations_NOUN of_ADP biscuits_NOUN arrive_VERB weekly_ADV ._.
The_DET vet_NOUN waives_VERB her_PRON fee_NOUN every_DET spring_NOUN ._.
The_DET thesis_NOUN needed_VERB one_NUM final_ADJ experiment_NOUN ._.
Her_PRON advisor_NOUN suggested_VERB a_DET simpler_ADJ control_NOUN ._.
The_DET result_NOUN held_VERB across_ADP every_DET sample_NOUN ._.
The_DET defense_NOUN lasted_VERB ninety_NUM minutes_NOUN and_CONJ felt_VERB like_ADP ten_NUM ._.
Her_PRON parents_NOUN drove_VERB four_NUM hundred_NUM miles_NOUN for_ADP the_DET handshake_NOUN ._.
Tide_NOUN pools_NOUN trap_VERB small_ADJ fish_NOUN at_ADP low_ADJ water_NOUN ._.
Gulls_NOUN work_VERB the_DET pools_NOUN with_ADP ugly_ADJ efficiency_NOUN ._.
A_DET boy_NOUN rescues_VERB a_DET crab_NOUN and_CONJ gets_VERB pinched_VERB ._.
His_PRON sister_NOUN laughs_VERB until_CONJ she_PRON drops_VERB her_PRON bucket_NOUN ._.
The_DET sea_NOUN takes_VERB the_DET bucket_NOUN and_CONJ gives_VERB back_PRT a_DET sandal_NOUN ._.
The_DET printer_NOUN jammed_VERB before_ADP the_DET board_NOUN meeting_NOUN ._.
An_DET intern_NOUN fixed_VERB it_PRON with_ADP a_DET paper_NOUN clip_NOUN ._.
The_DET slides_NOUN printed_VERB crooked_ADJ but_CONJ readable_ADJ ._.
Nobody_NOUN in_ADP the_DET room_NOUN noticed_VERB ._.
The_DET intern_NOUN got_VERB the_DET job_NOUN in_ADP June_NOUN ._.
Wind_NOUN turbines_NOUN line_VERB the_DET ridge_NOUN above_ADP the_DET farm_NOUN ._.
Their_PRON shadows_NOUN sweep_VERB the_DET barley_NOUN in_ADP long_ADJ arcs_NOUN ._.
The_DET farmer_NOUN leases_VERB the_DET land_NOUN and_CONJ keeps_VERB the_DET grazing_NOUN ._.
Sheep_NOUN ignore_VERB the_DET hum_NOUN completely_ADV ._.
Visitors_NOUN ask_VERB about_ADP it_PRON more_ADV than_CONJ the_DET sheep_NOUN do_VERB ._.
The_DET curator_NOUN hung_VERB the_DET portraits_NOUN in_ADP strict_ADJ date_NOUN order_NOUN ._.
A_DET critic_NOUN called_VERB the_DET plan_NOUN timid_ADJ ._.
The_DET public_NOUN loved_VERB the_DET quiet_ADJ progression_NOUN of_ADP faces_NOUN ._.
Attendance_NOUN doubled_VERB by_ADP the_DET third_NUM week_NOUN ._.
The_DET critic_NOUN returned_VERB and_CONJ stayed_VERB two_NUM hours_NOUN ._.
Night_NOUN trains_NOUN carry_VERB mail_NOUN and_CONJ a_DET few_ADJ quiet_ADJ travelers_NOUN ._.
The_DET dining_NOUN car_NOUN serves_VERB soup_NOUN until_CONJ one_NUM ._.
A_DET conductor_NOUN hums_VERB in_ADP the_DET empty_ADJ corridor_NOUN ._.
Lights_NOUN from_ADP small_ADJ towns_NOUN slide_VERB across_ADP the_DET ceiling_NOUN ._.
Morning_NOUN arrives_VERB with_ADP frost_NOUN on_ADP the_DET inside_NOUN of_ADP the_DET glass_NOUN ._.
The_DET co-op_NOUN voted_VERB to_PRT replace_VERB the_DET roof_NOUN ._.
Bids_NOUN came_VERB in_ADP high_ADJ ,_. so_CONJ they_PRON phased_VERB the_DET work_NOUN ._.
The_DET north_ADJ wing_NOUN stayed_VERB dry_ADJ all_DET winter_NOUN ._.
The_DET south_ADJ wing_NOUN collected_VERB buckets_NOUN and_CONJ jokes_NOUN ._.
Phase_NOUN two_NUM starts_VERB after_ADP the_DET thaw_NOUN ._.
A_DET linguist_NOUN recorded_VERB the_DET last_ADJ fluent_ADJ speaker_NOUN ._.
They_PRON worked_VERB through_ADP word_NOUN lists_NOUN every_DET afternoon_NOUN ._.
Her_PRON grandson_NOUN learned_VERB the_DET greetings_NOUN first_NUM ._.
The_DET archive_NOUN holds_VERB ninety_NUM hours_NOUN of_ADP tape_NOUN ._.
A_DET phone_NOUN app_NOUN now_ADV teaches_VERB the_DET numbers_NOUN ._.
The_DET storm_NOUN surge_NOUN flooded_VERB the_DET coastal_ADJ road_NOUN ._.
Ferries_NOUN replaced_VERB buses_NOUN for_ADP a_DET week_NOUN ._.
Shop_NOUN owners_NOUN swept_VERB mud_NOUN from_ADP their_PRON doorways_NOUN ._.
The_DET bridge_NOUN inspection_NOUN found_VERB no_DET damage_NOUN ._.
Life_NOUN returned_VERB to_PRT normal_ADJ before_ADP the_DET insurance_NOUN forms_NOUN did_VERB ._.
The_DET barber_NOUN knows_VERB every_DET rumor_NOUN in_ADP town_NOUN ._.
He_PRON trades_VERB them_PRON for_ADP better_ADJ ones_NOUN ._.
The_DET chair_NOUN by_ADP the_DET window_NOUN is_VERB reserved_VERB for_ADP the_DET oldest_ADJ customer_NOUN ._.
On_ADP slow_ADJ days_NOUN he_PRON sharpens_VERB scissors_NOUN and_CONJ listens_VERB to_PRT the_DET radio_NOUN ._.
His_PRON son_NOUN wants_VERB to_PRT modernize_VERB ;_. the_DET town_NOUN resists_VERB ._.
The_DET survey_NOUN ship_NOUN charts_VERB the_DET seabed_NOUN in_ADP long_ADJ passes_NOUN ._.
Sonar_NOUN paints_VERB ridges_NOUN no_DET eye_NOUN will_VERB ever_ADV see_VERB ._.
The_DET crew_NOUN names_VERB the_DET new_ADJ canyons_NOUN after_ADP their_PRON dogs_NOUN ._.
A_DET committee_NOUN renames_VERB them_PRON later_ADV ._.
The_DET dogs_NOUN keep_VERB the_DET glory_NOUN in_ADP the_DET ship_NOUN 's_PRT log_NOUN ._.
The_DET apprentice_NOUN ruined_VERB two_NUM dovetails_NOUN before_ADP lunch_NOUN ._.
The_DET carpenter_NOUN handed_VERB her_PRON a_DET sharper_ADJ chisel_NOUN ._.
The_DET third_NUM joint_NOUN closed_VERB like_ADP a_DET book_NOUN ._.
She_PRON keeps_VERB the_DET failed_ADJ pieces_NOUN on_ADP a_DET shelf_NOUN ._.
Customers_NOUN think_VERB they_PRON are_VERB art_NOUN ._.
The_DET observatory_NOUN opens_VERB to_PRT the_DET public_NOUN on_ADP clear_ADJ Fridays_NOUN ._.
Children_NOUN gasp_VERB at_ADP the_DET rings_NOUN of_ADP Saturn_NOUN ._.
A_DET volunteer_NOUN answers_VERB the_DET same_ADJ question_NOUN forty_NUM times_NOUN ._.
He_PRON never_ADV tires_VERB of_ADP it_PRON ._.
Clouds_NOUN end_VERB the_DET night_NOUN early_ADV ,_. and_CONJ nobody_NOUN minds_VERB much_ADV ._.
The_DET union_NOUN and_CONJ the_DET firm_NOUN settled_VERB at_ADP dawn_NOUN ._.
The_DET new_ADJ contract_NOUN adds_VERB dental_ADJ cover_NOUN and_CONJ a_DET third_NUM shift_NOUN ._.
Pickets_NOUN came_VERB down_PRT by_ADP noon_NOUN ._.
The_DET canteen_NOUN reopened_VERB with_ADP free_ADJ cake_NOUN ._.
Both_DET sides_NOUN claimed_VERB the_DET cake_NOUN as_CONJ their_PRON idea_NOUN ._.
A_DET drought_NOUN revealed_VERB the_DET old_ADJ village_NOUN under_ADP the_DET reservoir_NOUN ._.
Walkers_NOUN photographed_VERB the_DET church_NOUN tower_NOUN at_ADP sunset_NOUN ._.
Former_ADJ residents_NOUN traced_VERB their_PRON streets_NOUN in_ADP the_DET cracked_ADJ mud_NOUN ._.
Rain_NOUN closed_VERB the_DET site_NOUN within_ADP a_DET month_NOUN ._.
The_DET photographs_NOUN hang_VERB in_ADP the_DET parish_NOUN hall_NOUN now_ADV ._.
The_DET sommelier_NOUN recommends_VERB the_DET cheaper_ADJ bottle_NOUN ._.
The_DET table_NOUN doubts_VERB him_PRON and_CONJ orders_VERB both_DET ._.
He_PRON pours_VERB them_PRON blind_ADJ ._.
The_DET cheaper_ADJ bottle_NOUN wins_VERB four_NUM votes_NOUN to_PRT two_NUM ._.
Dessert_NOUN arrives_VERB with_ADP his_PRON compliments_NOUN ._.
The_DET seed_NOUN bank_NOUN stores_VERB duplicates_NOUN on_ADP two_NUM continents_NOUN ._.
Couriers_NOUN carry_VERB the_DET boxes_NOUN in_ADP ordinary_ADJ luggage_NOUN ._.
Each_DET packet_NOUN holds_VERB five_NUM hundred_NUM seeds_NOUN and_CONJ a_DET barcode_NOUN ._.
A_DET power_NOUN failure_NOUN once_ADV cost_VERB a_DET freezer_NOUN of_ADP beans_NOUN ._.
The_DET backup_NOUN site_NOUN had_VERB every_DET variety_NOUN ._.
The_DET playwright_NOUN cut_VERB the_DET second_NUM act_NOUN entirely_ADV ._.
Actors_NOUN mourned_VERB their_PRON best_ADJ lines_NOUN ._.
The_DET play_NOUN tightened_VERB into_ADP ninety_NUM relentless_ADJ minutes_NOUN ._.
Opening_NOUN night_NOUN earned_VERB three_NUM curtain_NOUN calls_NOUN ._.
The_DET cut_ADJ pages_NOUN became_VERB a_DET radio_NOUN sequel_NOUN ._.
The_DET ranger_NOUN counts_VERB eagles_NOUN from_ADP a_DET folding_NOUN chair_NOUN ._.
Two_NUM pairs_NOUN nest_VERB on_ADP the_DET cliff_NOUN this_DET year_NOUN ._.
Anglers_NOUN report_VERB every_DET sighting_NOUN at_ADP the_DET bait_NOUN shop_NOUN ._.
The_DET count_NOUN goes_VERB into_ADP a_DET national_ADJ database_NOUN ._.
Forty_NUM years_NOUN of_ADP numbers_NOUN tell_VERB a_DET slow_ADJ recovery_NOUN ._.
The_DET tailor_NOUN measures_VERB twice_ADV and_CONJ jokes_VERB once_ADV ._.
Chalk_NOUN lines_NOUN vanish_VERB under_ADP the_DET iron_NOUN ._.
A_DET good_ADJ seam_NOUN ,_. she_PRON says_VERB ,_. is_VERB invisible_ADJ ._.
Her_PRON waiting_NOUN list_NOUN runs_VERB to_PRT March_NOUN ._.
Nobody_NOUN complains_VERB about_ADP the_DET wait_NOUN ._.
"""


def main():
    out = []
    for line in SENTENCES.strip().splitlines():
        for tok in line.split():
            m = re.match(r"^(.+)_([A-Z.]+)$", tok)
            if not m:
                sys.exit(f"bad annotation: {tok}")
            w, t = m.group(1), m.group(2)
            lw = w.lower()
            if lw in LEXICON and LEXICON[lw] != t:
                sys.exit(f"closed-class violation: {w} tagged {t}, lexicon {LEXICON[lw]}")
            if not re.search(r"[A-Za-z0-9]", w) and t != ".":
                sys.exit(f"punctuation must be '.': {tok}")
            if re.fullmatch(r"[0-9]+([.,][0-9]+)*", w) and t != "NUM":
                sys.exit(f"digit token must be NUM: {tok}")
            out.append(f"{w}\t{t}")
    print("\n".join(out))
    sys.stderr.write(f"{len(out)} tokens validated\n")


if __name__ == "__main__":
    main()
